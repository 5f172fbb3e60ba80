"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Image/audio/video decode libraries are NOT in this container.  PNG, BMP
and GIF decode are REAL — pure-stdlib decoders (:func:`decode_png`: zlib
inflate + scanline unfiltering; :func:`decode_bmp`; :func:`decode_gif`:
variable-width LZW + palette) run in CI with no dependency; other formats
stay import-guarded stubs (Pillow slot) with deterministic fakes.  The
Spark-side plumbing (schema, Arrow batch shape, partitioning) is real and
tested throughout: this is exactly how a production pipeline isolates
heavyweight per-batch decoders (``mapInPandas``: batch in, batch out, no
per-row Python).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

FEATURE_DIM = 8


def attach_binary(docs: DataFrame) -> DataFrame:
    """Simulate a multimodal corpus: payload = utf-8 bytes of text (stands
    in for image bytes), plus typed metadata columns."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.octet_length(F.encode(F.col("text"), "utf-8")).cast("bigint").alias("n_bytes"),
    )


def payload_metadata(docs: DataFrame) -> DataFrame:
    """Map-only metadata pass over binary payloads (no decode)."""
    b = attach_binary(docs)
    return b.select(
        "doc_id",
        "n_bytes",
        F.md5(F.col("payload")).alias("payload_md5"),
    )


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (spec §9.4)."""
    pp = a + b - c
    pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> np.ndarray:
    """Minimal pure-stdlib PNG decoder: zlib inflate + per-scanline
    unfiltering (filters 0-4 per spec §9).  Subset: 8-bit greyscale / RGB /
    RGBA (color types 0/2/6), non-interlaced — the shapes a synthetic or
    screenshot corpus produces.  Returns ``(H, W, C)`` uint8.  Per-byte
    unfiltering runs in Python (fine for the Arrow-batch kernel — decode
    cost dominates at real image sizes; a C decoder drops into the same
    slot).  Raises ``ValueError`` on a non-PNG payload and
    ``NotImplementedError`` outside the subset."""
    import struct
    import zlib

    if not payload or payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    idat = bytearray()
    w = h = color = None
    while pos + 8 <= len(payload):
        ln, typ = struct.unpack(">I4s", payload[pos:pos + 8])
        pos += 8
        data = payload[pos:pos + ln]
        pos += ln + 4  # chunk data + CRC
        if typ == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or color not in (0, 2, 6) or interlace:
                raise NotImplementedError(
                    "PNG subset: 8-bit greyscale/RGB/RGBA, non-interlaced"
                )
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG: missing IHDR")
    channels = {0: 1, 2: 3, 6: 4}[color]
    raw = zlib.decompress(bytes(idat))
    stride = w * channels
    bpp = channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG: inflated size mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = bytearray(stride)
    p = 0
    for y in range(h):
        ft = raw[p]
        p += 1
        cur = bytearray(raw[p:p + stride])
        p += stride
        if ft == 1:  # Sub
            for i in range(bpp, stride):
                cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                cur[i] = (cur[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                ul = prev[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ft != 0:
            raise ValueError(f"PNG: bad filter type {ft}")
        out[y] = np.frombuffer(bytes(cur), dtype=np.uint8)
        prev = cur
    return out.reshape(h, w, channels)


def decode_bmp(payload: bytes) -> np.ndarray:
    """Minimal pure-stdlib BMP decoder: uncompressed (BI_RGB) 24/32-bit
    BITMAPINFOHEADER — the format Windows tooling and many dataset dumps
    emit.  Returns H×W×3 (or ×4) uint8, top-down row order (BMP stores
    bottom-up when height > 0).  Raises ``ValueError`` on a non-BMP
    payload and ``NotImplementedError`` outside the subset (palette,
    RLE, 16-bit)."""
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("BMP subset: BITMAPINFOHEADER or later")
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (24, 32) or planes != 1:
        raise NotImplementedError("BMP subset: uncompressed 24/32-bit")
    bottom_up = h > 0
    h = abs(h)
    ch = bpp // 8
    stride = (w * ch + 3) & ~3  # rows pad to 4 bytes
    need = data_off + stride * h
    if len(payload) < need:
        raise ValueError("BMP: truncated pixel array")
    rows = []
    for y in range(h):
        off = data_off + y * stride
        row = np.frombuffer(payload, dtype=np.uint8, count=w * ch, offset=off)
        rows.append(row.reshape(w, ch)[:, [2, 1, 0] + ([3] if ch == 4 else [])])
    img = np.stack(rows[::-1] if bottom_up else rows)  # BGR(A) -> RGB(A)
    return img


def _gif_lzw(min_code_size: int, data: bytes) -> bytes:
    """GIF variable-width LZW decode (spec appendix F): LSB-first bit
    packing, code width grows up to 12 bits, CLEAR resets the table."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    acc = nbits = pos = 0
    while True:
        while nbits < code_size:
            if pos >= len(data):
                return bytes(out)  # stream may omit the END code
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            return bytes(out)
        if prev is None:
            if code >= len(table):  # first code after CLEAR must be literal
                raise ValueError("GIF: truncated/corrupt stream")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("GIF: corrupt LZW stream (code out of range)")
        out += entry
        prev = entry
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1


def decode_gif(payload: bytes) -> np.ndarray:
    """Minimal pure-stdlib GIF decoder: GIF87a/89a, first image frame,
    global or local color table, non-interlaced — returns H×W×3 uint8 via
    palette lookup.  Extensions (graphic control, comments, application)
    are skipped as sub-block chains; animation reads frame 1 only.
    Raises ``ValueError`` on a non-GIF payload and ``NotImplementedError``
    for interlaced images."""
    import struct

    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    _w, _h, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(payload):
        b0 = payload[pos]
        pos += 1
        if b0 == 0x21:  # extension: label + sub-block chain
            pos += 1
            while True:
                if pos >= len(payload):
                    raise ValueError("GIF: truncated/corrupt stream")
                if not payload[pos]:
                    break
                pos += payload[pos] + 1
            pos += 1
        elif b0 == 0x2C:  # image descriptor
            if pos + 9 > len(payload):
                raise ValueError("GIF: truncated/corrupt stream")
            _x, _y, iw, ih, iflags = struct.unpack_from("<HHHHB", payload, pos)
            pos += 9
            if iflags & 0x40:
                raise NotImplementedError("GIF subset: non-interlaced only")
            pal = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                pal = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if pal is None:
                raise ValueError("GIF: no color table")
            if pos >= len(payload):
                raise ValueError("GIF: truncated/corrupt stream")
            mcs = payload[pos]
            pos += 1
            data = bytearray()
            while True:
                if pos >= len(payload):
                    raise ValueError("GIF: truncated/corrupt stream")
                sz = payload[pos]
                if not sz:
                    break
                data += payload[pos + 1 : pos + 1 + sz]
                pos += sz + 1
            idx = _gif_lzw(mcs, bytes(data))
            if len(idx) < iw * ih:
                raise ValueError("GIF: truncated index stream")
            arr = np.frombuffer(idx[: iw * ih], np.uint8).reshape(ih, iw)
            if int(arr.max(initial=0)) >= len(pal):
                raise ValueError("GIF: pixel index outside color table")
            return pal[arr]
        elif b0 == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"GIF: unknown block 0x{b0:02x}")
    raise ValueError("GIF: no image data")


def _decode_image_real(payload: bytes) -> np.ndarray:
    """Real decode slot.  PNG, uncompressed BMP and GIF decode via the
    pure-stdlib :func:`decode_png` / :func:`decode_bmp` /
    :func:`decode_gif` (no third-party dependency); other formats require
    Pillow, absent from this container — import-guarded."""
    if payload and payload[:8] == _PNG_SIG:
        return decode_png(payload)
    if payload and payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload and payload[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(payload)
    try:
        from PIL import Image  # noqa: F401 — not installed in this container
    except ImportError as e:
        raise NotImplementedError(
            "non-PNG image decode requires Pillow; deploy with --py-files + conda env"
        ) from e
    raise NotImplementedError(
        "non-PNG decode path not exercised in this sandbox"
    )  # pragma: no cover


def _fake_features(
    payload: bytes, dim: int = FEATURE_DIM, normalize: bool = True
) -> list[float]:
    """Deterministic fake 'embedding': byte histogram folded to `dim`
    buckets, normalized — stands in for a CNN/CLIP feature extractor.
    With ``normalize=False`` returns the raw integer counts (exact, so
    the driver's value-hash check is float-free)."""
    if payload is None or len(payload) == 0:
        return [0.0] * dim
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr % dim, minlength=dim).astype("float64")
    if not normalize:
        return list(hist)
    total = hist.sum()
    return list(np.round(hist / total, 6)) if total else [0.0] * dim


def extract_features(
    binary_df: DataFrame, use_real_decoder: bool = False, normalize: bool = True
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Batch shape contract: input batches carry (doc_id, payload); output
    (doc_id, features array<double>). The real decoder slot is where a
    Pillow/torchvision kernel drops in unchanged.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if use_real_decoder:
                # decoded pixel histogram through the same feature fold —
                # the byte-histogram fake path below stays unchanged
                feats = [
                    _fake_features(
                        _decode_image_real(p).tobytes(), normalize=normalize
                    )
                    for p in pdf["payload"]
                ]
            else:
                feats = [_fake_features(p, normalize=normalize) for p in pdf["payload"]]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return binary_df.select("doc_id", "payload").mapInPandas(
        kernel, schema="doc_id bigint, features array<double>"
    )


def frame_sample(binary_df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' stub: emit one row per sampled offset of the
    payload (the video-frame analogue: one input row → many output rows,
    exercising the explode-shaped mapInPandas contract)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, offs, vals = [], [], []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = payload or b""
                for off in range(0, len(data), every_n_bytes):
                    ids.append(did)
                    offs.append(off)
                    vals.append(int(data[off]))
            yield pd.DataFrame({"doc_id": ids, "frame_offset": offs, "sample_value": vals})

    return binary_df.select("doc_id", "payload").mapInPandas(
        kernel, schema="doc_id bigint, frame_offset bigint, sample_value bigint"
    )


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Pure-stdlib WAV (RIFF PCM) decoder via the :mod:`wave` module —
    the audio analogue of :func:`decode_png`: a REAL decode kernel with
    zero third-party dependencies.  Returns ``(samples, sample_rate)``
    where samples is ``(n_frames, n_channels)`` int32 (8-bit PCM is
    recentred from unsigned to signed; 16/32-bit pass through).  Raises
    ``ValueError`` on a non-WAV payload."""
    import io
    import wave

    if not payload or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    with wave.open(io.BytesIO(payload)) as w:
        nch, sw, rate, nframes = (
            w.getnchannels(), w.getsampwidth(), w.getframerate(), w.getnframes(),
        )
        raw = w.readframes(nframes)
    if sw == 1:
        arr = np.frombuffer(raw, dtype=np.uint8).astype(np.int32) - 128
    elif sw == 2:
        arr = np.frombuffer(raw, dtype="<i2").astype(np.int32)
    elif sw == 4:
        arr = np.frombuffer(raw, dtype="<i4").astype(np.int32)
    else:
        raise NotImplementedError(f"WAV sample width {sw} bytes")
    return arr.reshape(-1, nch), rate


def _audio_signal(payload: bytes) -> tuple[np.ndarray, int, int]:
    """(channel-0 signal as int64, n_channels, sample_rate).  RIFF/WAVE
    payloads decode for real; anything else takes the deterministic fake
    path — bytes read as unsigned 8-bit PCM at 8 kHz (recentred), the
    same stand-in convention as the byte-histogram image features."""
    if payload and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        samples, rate = decode_wav(payload)
        return samples[:, 0].astype(np.int64), samples.shape[1], rate
    data = np.frombuffer(payload or b"", dtype=np.uint8).astype(np.int64) - 128
    return data, 1, 8000


def audio_features(binary_df: DataFrame) -> DataFrame:
    """Arrow-batched audio feature extraction: per payload, channel-0
    energy (exact integer sum of squares — no float in the contract),
    zero-crossing count (sign products < 0), frame count, channel count,
    sample rate.  Payloads with no samples are dropped (empty docs).

    Batch contract mirrors :func:`extract_features`: (doc_id, payload) in,
    typed feature row out; a torchaudio/librosa kernel drops into the
    same slot.  Integer outputs keep the DuckDB oracle byte-exact."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ns, nc, sr, ssq, zc = [], [], [], [], [], []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                sig, channels, rate = _audio_signal(payload)
                if sig.size == 0:
                    continue
                ids.append(did)
                ns.append(sig.size)
                nc.append(channels)
                sr.append(rate)
                ssq.append(int((sig * sig).sum()))
                zc.append(int((sig[:-1] * sig[1:] < 0).sum()))
            yield pd.DataFrame({
                "doc_id": ids, "n_samples": ns, "n_channels": nc,
                "sample_rate": sr, "energy_ssq": ssq, "zero_crossings": zc,
            })

    return binary_df.select("doc_id", "payload").mapInPandas(
        kernel,
        schema="doc_id bigint, n_samples bigint, n_channels bigint, "
               "sample_rate bigint, energy_ssq bigint, zero_crossings bigint",
    )

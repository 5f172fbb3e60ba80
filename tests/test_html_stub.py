"""S2 HTML→RDF stub: plumbing present, kernel marked unimplemented."""

from rdfshape_api_spark.sources.parsers import parse_document


def test_html_formats_route_to_error_channel():
    for lang in ("html-rdfa11", "html-microdata"):
        triples, err = parse_document("<html></html>", lang)
        assert triples == []
        assert err is not None and "NotImplementedError" in err


def test_unknown_format_still_errors():
    triples, err = parse_document("x", "rdf-star-quint")
    assert triples == [] and "unsupported format" in err

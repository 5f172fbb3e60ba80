"""S2 HTML→RDF dispatch: formats parse (see test_html2rdf.py); empty and
unknown inputs behave sanely on the error channel."""

from rdfshape_api_spark.sources.parsers import parse_document


def test_html_formats_parse_cleanly():
    for lang in ("html-rdfa11", "html-microdata"):
        triples, err = parse_document("<html><body></body></html>", lang)
        assert err is None
        assert triples == []  # no RDFa/Microdata markup → no triples


def test_html_with_markup_yields_triples():
    doc = (
        '<div itemscope itemtype="http://schema.org/Thing" itemid="http://e/x">'
        '<span itemprop="name">N</span></div>'
    )
    triples, err = parse_document(doc, "html-microdata")
    assert err is None and len(triples) == 2


def test_unknown_format_still_errors():
    triples, err = parse_document("x", "rdf-star-quint")
    assert triples == [] and "unsupported format" in err

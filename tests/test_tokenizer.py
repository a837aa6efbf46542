from elasticsearch_assets_ray.analysis.tokenizer import (
    analyzer_for_lang,
    clip_tokens,
    code_tokens,
    get_analyzer,
    register_analyzer,
    simple_tokens,
    text_tokens,
)


def test_camel_and_snake_splitting():
    assert code_tokens("fooBar baz_qux") == ["foo", "bar", "baz", "qux"]
    assert code_tokens("HTTPServer") == ["http", "server"]
    assert code_tokens("parseJSON2XML") == ["parse", "json2", "xml"]
    assert code_tokens("sha256sum") == ["sha256sum"]
    assert code_tokens("__init__") == ["init"]
    assert code_tokens("x = y+z; // comment") == ["x", "y", "z", "comment"]


def test_simple_analyzer_sql_parity():
    # must behave exactly like regexp_split_to_array(lower(text), '[^a-z0-9]+')
    import duckdb

    samples = ["Foo_bar BAZ-12 qux", "a..b!!C", "", "123 abc_DEF"]
    con = duckdb.connect()
    for s in samples:
        (want,) = con.execute(
            "select list_filter(regexp_split_to_array(lower(?), '[^a-z0-9]+'), x -> x != '')",
            [s],
        ).fetchone()
        assert simple_tokens(s) == want


def test_text_analyzer_drops_stopwords():
    assert text_tokens("The cat and the hat") == ["cat", "hat"]


def test_registry_and_lang_map():
    assert analyzer_for_lang("markdown") is get_analyzer("text")
    assert analyzer_for_lang("python") is get_analyzer("code")
    register_analyzer("upper", lambda s: [s.upper()])
    assert get_analyzer("upper")("x") == ["X"]


def test_clip_tokens():
    assert clip_tokens(["a", "ab", "abc"], 2, 2) == ["ab"]


def test_analyze_api_shape_and_offsets():
    """ES _analyze wrapper: positions number the emitted stream, offsets
    index the raw text, <NUM> tags all-digit tokens."""
    from elasticsearch_assets_ray.analysis.tokenizer import analyze

    text = "Foo_bar 42 baz-qux 7x"
    rows = analyze(text, "simple")
    assert [r["token"] for r in rows] == ["foo", "bar", "42", "baz", "qux",
                                          "7x"]
    assert [r["position"] for r in rows] == list(range(6))
    for r in rows:
        assert text[r["start_offset"]:r["end_offset"]].lower() == r["token"]
    assert rows[2]["type"] == "<NUM>"
    assert rows[0]["type"] == "<ALPHANUM>"
    # code analyzer splits camel/snake with exact spans
    rows = analyze("HTTPServer fooBar", "code")
    assert [r["token"] for r in rows] == ["http", "server", "foo", "bar"]
    for r in rows:
        src = "HTTPServer fooBar"[r["start_offset"]:r["end_offset"]]
        assert src.lower() == r["token"]
    # stopword-filtering analyzer: positions stay consecutive (index
    # semantics, disclosed divergence from ES stop-filter gaps)
    rows = analyze("the cat and the hat", "text")
    assert [r["token"] for r in rows] == ["cat", "hat"]
    assert [r["position"] for r in rows] == [0, 1]

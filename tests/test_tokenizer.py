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


def test_stem_analyzer_aligns_with_simple():
    """`stem` is 1:1 with `simple` (the span_field_masking position
    contract) and the arrow build path matches the registry function."""
    import pyarrow as pa

    from elasticsearch_assets_ray.analysis.tokenizer import (
        clip_tokens,
        get_analyzer,
        stem_token,
    )
    from elasticsearch_assets_ray.index.build import tokenize_codes_arrow

    texts = [
        "Merging tables with hashed keys!",
        "bodies of caches going s a es dress",
        "the query rows rowing value",
        "",
    ]
    simple = get_analyzer("simple")
    stem = get_analyzer("stem")
    for t in texts:
        s_toks, m_toks = simple(t), stem(t)
        assert len(s_toks) == len(m_toks)
        assert m_toks == [stem_token(x) for x in s_toks]
    assert [stem_token(t) for t in
            ["merging", "bodies", "caches", "table", "dress", "es", "as"]
            ] == ["merg", "bod", "cach", "tabl", "dres", "es", "as"]
    terms, codes, rel, dls = tokenize_codes_arrow(
        pa.array(texts), "stem", 1, 64, {}
    )
    got = [[terms[c] for c, r in zip(codes, rel) if r == i]
           for i in range(len(texts))]
    want = [clip_tokens(stem(t), 1, 64) for t in texts]
    assert got == want


def test_stem_matches_duckdb_regexp():
    """The RE2 expression embedded in the masked-span SQL oracle is the
    stem_token function verbatim (leftmost-match agreement)."""
    import duckdb

    from elasticsearch_assets_ray.analysis.tokenizer import stem_token

    toks = ["merging", "bodies", "caches", "table", "dress", "es", "as",
            "value", "the", "a", "sort", "keys", "going", "ss", "se",
            "tries", "freed", "sees", "blues", "queue", "rowing"]
    con = duckdb.connect()
    got = con.execute(
        "SELECT CASE WHEN len(regexp_replace(t, '(ing|ies|ed|es|s|e)$', ''))"
        " >= 2 THEN regexp_replace(t, '(ing|ies|ed|es|s|e)$', '') ELSE t END"
        " FROM (SELECT unnest(?) AS t)",
        [toks],
    ).fetchall()
    assert [g[0] for g in got] == [stem_token(t) for t in toks]

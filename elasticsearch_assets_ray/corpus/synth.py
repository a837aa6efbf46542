"""Deterministic synthetic fixtures (FIXTURES.md F1/F2/F4).

Descendant of the reference's ``elasticsearch_data_generator``
(``/root/reference/asset/elasticsearch_data_generator/index.js:9-96``,
``default_schema.js:6-107``) with one crucial difference: the reference
generator is wall-clock / unseeded-random based; ours is reproducible from
``(seed, n_rows)`` alone — every row derives from a per-row RNG stream, so
the output is identical regardless of partitioning or parallelism (the
property the reference gets from replaying its slicer generator,
``asset/id_reader/id_slicer.js:178-199``, we get by construction).

F1 ``corpus``: the north-rule input shape
``(repo, path, commit, lang, content)`` — template-based source-code text
with Zipf(1.2) identifier reuse, camelCase + snake_case mixing, hot tokens
(``import``, ``return``, ``def``/``function``) in well over 60% of rows,
and one 10×-hot repo, so posting-list skew and groupby skew are both real.
"""

from __future__ import annotations

import hashlib
import os
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

LANGS = ["python", "javascript", "java", "go", "rust", "c", "markdown"]
_LANG_WEIGHTS = np.array([0.30, 0.20, 0.15, 0.10, 0.10, 0.10, 0.05])
_LANG_EXT = {
    "python": "py",
    "javascript": "js",
    "java": "java",
    "go": "go",
    "rust": "rs",
    "c": "c",
    "markdown": "md",
}

# fixed identifier vocabulary; Zipf(1.2) rank weights give heavy reuse
_BASE_WORDS = [
    "data", "config", "handler", "value", "result", "index", "query", "node",
    "parse", "build", "run", "get", "set", "load", "store", "batch", "stream",
    "shard", "merge", "token", "score", "cache", "client", "server", "worker",
    "task", "state", "count", "total", "offset", "limit", "key", "hash",
    "path", "file", "read", "write", "open", "close", "init", "start", "stop",
    "update", "delete", "create", "check", "valid", "error", "retry", "slice",
    "range", "block", "segment", "term", "doc", "field", "meta", "row", "col",
    "table", "buffer", "encode", "decode", "pack", "span", "tree", "list",
    "map", "dict", "item", "entry", "group", "sort", "filter", "reduce",
    "apply", "emit", "flush", "sync", "wait", "poll", "send", "recv", "bind",
    "parseq", "vectr", "quorum", "lattice", "miniheap", "zigzag", "bloomy",
    "skipnet", "fanout", "pivot", "salted", "probe", "cursor", "replay",
]
_NUM_VOCAB = 400  # compound identifiers generated below extend the base list


def _build_vocab() -> list[str]:
    vocab = list(_BASE_WORDS)
    i = 0
    while len(vocab) < _NUM_VOCAB:
        a = _BASE_WORDS[i % len(_BASE_WORDS)]
        b = _BASE_WORDS[(i * 7 + 3) % len(_BASE_WORDS)]
        vocab.append(f"{a}_{b}" if i % 2 == 0 else a + b.capitalize())
        i += 1
    return vocab


_VOCAB = _build_vocab()
_ZIPF_P = 1.0 / np.arange(1, len(_VOCAB) + 1) ** 1.2
_ZIPF_CUM = np.cumsum(_ZIPF_P / _ZIPF_P.sum())

_TEMPLATES = {
    "python": (
        "import {0}\nfrom {1} import {2}\n",
        "def {0}_{1}({2}, {3}):\n    # {4} {5}\n    {6} = {2}.{7}({3})\n"
        "    if {6} > 0:\n        return {8}({6})\n    return {6}\n",
        'class {0}:\n    """{1} {2}."""\n    def {3}(self, {4}):\n'
        "        self.{5} = {4}\n        return self.{5}\n",
    ),
    "javascript": (
        "import {{ {0} }} from '{1}';\n",
        "function {0}{1}({2}, {3}) {{\n  const {4} = {2}.{5}({3});\n"
        "  return {4} + {6};\n}}\n",
        "const {0} = ({1}) => {{ return {1}.{2}; }};\n",
    ),
    "java": (
        "import com.{0}.{1};\n",
        "public class {0} {{\n  private int {1};\n"
        "  public int {2}{3}(int {4}) {{\n    return this.{1} + {4};\n  }}\n}}\n",
    ),
    "go": (
        'import "{0}/{1}"\n',
        "func {0}{1}({2} int) int {{\n\t{3} := {2} * 2\n\treturn {3}\n}}\n",
    ),
    "rust": (
        "use {0}::{1};\n",
        "fn {0}_{1}({2}: u64) -> u64 {{\n    let {3} = {2} + 1;\n    return {3};\n}}\n",
    ),
    "c": (
        "#include <{0}.h>\n",
        "static int {0}_{1}(int {2}) {{\n  int {3} = {2} << 1;\n  return {3};\n}}\n",
    ),
    "markdown": (
        "# {0} {1}\n\nThe {2} module handles {3} and {4}.\n",
        "- {0}: see the {1} guide for {2} details\n",
    ),
}


def _sample_words(rng: np.random.Generator, n: int) -> list[str]:
    idx = np.searchsorted(_ZIPF_CUM, rng.random(n))
    return [_VOCAB[i] for i in idx]


def make_corpus_batch(row_ids: np.ndarray, seed: int = 42) -> pa.Table:
    """Generate F1 corpus rows for the given global row ids (vectorizable unit)."""
    repos, paths, commits, langs, contents = [], [], [], [], []
    lang_cum = np.cumsum(_LANG_WEIGHTS)
    for rid in row_ids.tolist():
        rng = np.random.default_rng((seed << 32) ^ rid)
        # repo: Zipf-ish reuse; repo index 0 is the 10×-hot repo
        r = rng.random()
        repo_i = 0 if r < 0.35 else int(rng.integers(1, 7 * 23))
        repos.append(f"org{repo_i % 7}/repo{repo_i % 23}")
        lang = LANGS[int(np.searchsorted(lang_cum, rng.random()))]
        langs.append(lang)
        n_lines = int(np.exp(rng.normal(2.3, 0.7))) + 3
        tpl_pool = _TEMPLATES[lang]
        words = _sample_words(rng, n_lines * 9 + 9)
        parts = []
        for li in range(n_lines):
            tpl = tpl_pool[int(rng.integers(0, len(tpl_pool)))]
            w = words[li * 9 : (li + 1) * 9]
            parts.append(tpl.format(*w))
        content = "\n".join(parts)[: 64 * 1024]
        contents.append(content)
        d, name = words[-2], words[-1]
        paths.append(f"src/{d}/{name}.{_LANG_EXT[lang]}")
        commits.append(hashlib.sha1(f"{seed}:{rid}".encode()).hexdigest())
    return pa.table(
        {
            "repo": pa.array(repos, pa.string()),
            "path": pa.array(paths, pa.string()),
            "commit": pa.array(commits, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "content": pa.array(contents, pa.large_string()),
        }
    )


def write_corpus(
    out_dir: str | Path,
    n_rows: int,
    seed: int = 42,
    rows_per_file: int = 5_000,
    overwrite: bool = False,
) -> Path:
    """Materialize the F1 corpus as partitioned Parquet (cached by layout).

    Layout is a function of (seed, n_rows, rows_per_file) only; an existing
    complete directory is reused — bench/test runs never regenerate.
    """
    out_dir = Path(out_dir)
    marker = out_dir / "_COMPLETE"
    if marker.exists() and not overwrite:
        return out_dir
    out_dir.mkdir(parents=True, exist_ok=True)
    n_files = (n_rows + rows_per_file - 1) // rows_per_file
    for f in range(n_files):
        lo, hi = f * rows_per_file, min((f + 1) * rows_per_file, n_rows)
        tbl = make_corpus_batch(np.arange(lo, hi, dtype=np.int64), seed=seed)
        tmp = out_dir / f".part-{f:05d}.parquet.tmp"
        pq.write_table(tbl, tmp, row_group_size=1_000)
        os.replace(tmp, out_dir / f"part-{f:05d}.parquet")
    marker.write_text(f"seed={seed} n_rows={n_rows} rows_per_file={rows_per_file}\n")
    return out_dir


def reference_queries(n_hot: int = 3, n_rare: int = 6, n_multi: int = 8) -> pa.Table:
    """F2 reference query set over the F1 corpus (deterministic)."""
    rows: list[tuple[str, int]] = []
    rows += [("import", 10), ("return", 10), ("data", 10)][:n_hot]
    rare = ["quorum", "lattice", "miniheap", "zigzag", "bloomy", "skipnet"]
    rows += [(w, 10) for w in rare[:n_rare]]
    multi = [
        "parse config value", "build index shard", "merge segment block",
        "query score cache", "stream batch worker", "token filter sort",
        "salted probe cursor", "load store flush",
    ]
    rows += [(q, 10) for q in multi[:n_multi]]
    rows += [("fooBarBaz", 10), ("batch_stream", 10)]  # camel / snake idents
    rows += [("zzzzqqqq", 10)]  # absent from corpus → empty result
    rows += [("import", 1), ("import", 100)]  # k variants
    return pa.table(
        {
            "query_id": pa.array(range(len(rows)), pa.int64()),
            "query": pa.array([q for q, _ in rows], pa.string()),
            "k": pa.array([k for _, k in rows], pa.int32()),
        }
    )


_USER_AGENTS = [f"agent/{i}.{i * 3 % 7}" for i in range(20)]


def make_gen_docs(n_rows: int, seed: int = 42, id_start_key: str | None = None) -> pa.Table:
    """F4: mirror of the reference's default mock document
    (``default_schema.js:9-34``), seeded; used by sink/routing tests."""
    rng = np.random.default_rng(seed)
    ips = [".".join(str(x) for x in rng.integers(1, 255, 4)) for _ in range(n_rows)]
    created_epoch = rng.integers(1438387200000, 1451433600000, n_rows)  # 2015-08..12
    import datetime as dt

    created = [
        dt.datetime.fromtimestamp(ms / 1000, dt.timezone.utc).strftime(
            "%Y-%m-%dT%H:%M:%S.%f"
        )[:-3]
        + "+00:00"
        for ms in created_epoch
    ]
    hexd = np.array(list("0123456789abcdef"))
    ids = ["".join(hexd[rng.integers(0, 16, 8)]) for _ in range(n_rows)]
    if id_start_key:
        ids = [id_start_key + i[1:] for i in ids]
    lat = rng.uniform(-90, 90, n_rows).round(4)
    lon = rng.uniform(-180, 180, n_rows).round(4)
    return pa.table(
        {
            "ip": pa.array(ips),
            "userAgent": pa.array([_USER_AGENTS[i] for i in rng.integers(0, 20, n_rows)]),
            "url": pa.array([f"https://{_VOCAB[i]}.org" for i in rng.integers(0, 50, n_rows)]),
            "uuid": pa.array(
                [hashlib.md5(f"{seed}:{i}".encode()).hexdigest() for i in range(n_rows)]
            ),
            "created": pa.array(created),
            "ipv6": pa.array(
                [":".join(f"{x:04x}" for x in rng.integers(0, 65536, 8)) for _ in range(n_rows)]
            ),
            "location": pa.array([f"{a},{b}" for a, b in zip(lat, lon)]),
            "bytes": pa.array(rng.integers(7850, 5642867, n_rows), pa.int64()),
            "id": pa.array(ids),
        }
    )

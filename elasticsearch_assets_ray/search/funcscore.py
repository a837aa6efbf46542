"""ES ``function_score`` with a FUNCTIONS LIST: per-function filters and
weights, ``score_mode`` combination and ``boost_mode`` application — the
full multi-function form of the query (the single-function
field_value_factor / decay paths live in ``engine.py`` /
``term_engine.py``; this module is the shared kernel both engines call
for the list form, so results are identical by construction).

Function specs are plain dicts (they ship to shard actors over the Ray
wire):

- ``{"type": "field_value_factor", "field", "factor", "modifier",
  "missing"}`` — modifier table in :func:`engine.apply_fvf_modifier`
  (ES base-10 logs);
- ``{"type": "decay", "function": "gauss|exp|linear", "field",
  "origin", "scale", "offset", "decay"}`` — formulations in
  :func:`engine.apply_decay`; docs missing the field take 1.0;
- ``{"type": "weight"}`` — constant 1.0 (the weight multiplier below
  supplies the value — ES's pure-weight function);
- ``{"type": "script_score", "script": "<expr>"}`` — the expression
  subset below over doc values and ``_score``;
- ``{"type": "rank_feature", "field", "function":
  "saturation|log|sigmoid", "pivot"/"scaling_factor"/"exponent"}`` —
  the ES ``rank_feature`` query as a should-clause contribution (run
  with score_mode="sum", boost_mode="sum"; ``weight`` is the query
  boost); missing/non-positive feature → 0 (doc doesn't match);
- ``{"type": "distance_feature", "field", "origin", "pivot"}`` —
  ES ``distance_feature``: pivot/(pivot+|v−origin|), dates in epoch
  micros; missing → 0;
- ``{"type": "random_score", "seed": int, "field": "orig_id"}`` —
  deterministic uniform [0, 1): Knuth multiplicative hash of
  ``field + seed`` (``ops.sampling.knuth_hash_u32`` — SQL-reproducible,
  unlike ES's internal hash; disclosed divergence, the DISTRIBUTION
  contract is what's kept).

Common optional keys: ``"weight"`` (multiplies the function's value;
in ``score_mode="avg"`` it is also the averaging weight — the ES
weighted average) and ``"filter"`` — a docmeta predicate
``{"field": f, "term": v}`` or ``{"field": f, "range": [lo, hi,
lo_incl, hi_incl]}`` (the recency/category boost pattern; full-query
filters are not supported here — disclosed).

``score_mode``: multiply (default) | sum | avg | max | min | first.
``boost_mode``: multiply (default) | sum | avg | max | min | replace.
Docs matching NO function keep their query score untouched (no
boost_mode combine — the ES contract).  ``max_boost`` caps the combined
function value before boost_mode.

Script expression subset (script_score): ``_score``, bare field names
or ``doc['field']``, numbers, ``+ - * /``, parens, unary minus, and
``log`` (natural), ``log10``, ``sqrt``, ``exp``, ``abs``,
``min(a,b)``, ``max(a,b)``, ``pow(a,b)``, and the trig/floor set
``sin cos tan asin atan floor`` — all ANSI-SQL-mirrorable so the
driver oracle can verify.
"""

from __future__ import annotations

import re

import numpy as np

_NUM_RX = re.compile(r"\d+\.?\d*(?:[eE][+-]?\d+)?\Z")
_SCRIPT_TOKEN_RX = re.compile(
    r"\d+\.?\d*(?:[eE][+-]?\d+)?"
    r"|doc\['[^']+'\](?:\.value)?|doc\[\"[^\"]+\"\](?:\.value)?"
    r"|[A-Za-z_][A-Za-z0-9_.]*"
    r"|==|!=|<=|>="
    r"|[()+\-*/%,<>]"
)

_CMP_OPS = {
    "==": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
}

_FUNCS1 = {
    "log": np.log,
    "log10": np.log10,
    "sqrt": np.sqrt,
    "exp": np.exp,
    "abs": np.abs,
    # trig + floor: what geo runtime fields (haversine distance, slippy
    # geotile x/y) need; every one is an ANSI-SQL builtin so oracles
    # can mirror the expression verbatim
    "sin": np.sin,
    "cos": np.cos,
    "tan": np.tan,
    "asin": np.arcsin,
    "atan": np.arctan,
    "floor": np.floor,
}
_FUNCS2 = {
    "min": np.minimum,
    "max": np.maximum,
    "pow": np.power,
}


class ScriptError(ValueError):
    pass


class ScriptExpr:
    """A compiled script_score expression: ``fields`` lists the doc-value
    columns it reads; ``__call__(env)`` evaluates vectorized over an env
    of equal-length arrays (must contain every field plus ``_score``)."""

    def __init__(self, src: str):
        toks = _SCRIPT_TOKEN_RX.findall(src or "")
        if "".join(toks).replace(" ", "") != (src or "").replace(" ", ""):
            raise ScriptError(f"unsupported script syntax: {src!r}")
        self.fields: list[str] = []
        self._toks = toks
        self._i = 0
        self._ast = self._expr()
        if self._i != len(toks):
            raise ScriptError(f"trailing input at {toks[self._i]!r}")

    # node = ("num", x) | ("var", name) | ("neg", n) | (op, a, b)
    #      | ("fn1", fn, a) | ("fn2", fn, a, b)
    def _peek(self):
        return self._toks[self._i] if self._i < len(self._toks) else None

    def _take(self):
        t = self._toks[self._i]
        self._i += 1
        return t

    def _expr(self):
        # one optional comparison above the arithmetic (the script-QUERY
        # predicate form; painless booleans → 1.0/0.0, no chaining)
        n = self._sum()
        if self._peek() in _CMP_OPS:
            op = self._take()
            n = ("cmp", op, n, self._sum())
        return n

    def _sum(self):
        n = self._term()
        while self._peek() in ("+", "-"):
            op = self._take()
            n = (op, n, self._term())
        return n

    def _term(self):
        n = self._unary()
        while self._peek() in ("*", "/", "%"):
            op = self._take()
            n = (op, n, self._unary())
        return n

    def _unary(self):
        if self._peek() == "-":
            self._take()
            return ("neg", self._unary())
        return self._atom()

    def _atom(self):
        t = self._take()
        if t == "(":
            n = self._expr()
            if self._peek() == ")":
                self._take()
            return n
        if _NUM_RX.match(t):
            return ("num", float(t))
        if t.startswith("doc["):
            if t.endswith(".value"):  # ES doc['f'].value sugar
                t = t[: -len(".value")]
            name = t[5:-2]
        elif t in _FUNCS1 and self._peek() == "(":
            self._take()
            a = self._expr()
            if self._peek() == ")":
                self._take()
            return ("fn1", t, a)
        elif t in _FUNCS2 and self._peek() == "(":
            self._take()
            a = self._expr()
            if self._peek() != ",":
                raise ScriptError(f"{t}() needs two arguments")
            self._take()
            b = self._expr()
            if self._peek() == ")":
                self._take()
            return ("fn2", t, a, b)
        else:
            name = t
        if name != "_score" and name not in self.fields:
            self.fields.append(name)
        return ("var", name)

    def __call__(self, env: dict) -> np.ndarray:
        def ev(n):
            k = n[0]
            if k == "num":
                return n[1]
            if k == "var":
                return env[n[1]]
            if k == "neg":
                return -ev(n[1])
            if k == "+":
                return ev(n[1]) + ev(n[2])
            if k == "-":
                return ev(n[1]) - ev(n[2])
            if k == "*":
                return ev(n[1]) * ev(n[2])
            if k == "/":
                return ev(n[1]) / ev(n[2])
            if k == "%":
                # C/Java-style remainder (painless %, DuckDB %) — NOT
                # np.mod's floored variant (they differ on negatives)
                return np.fmod(ev(n[1]), ev(n[2]))
            if k == "cmp":
                return _CMP_OPS[n[1]](ev(n[2]), ev(n[3])).astype(
                    np.float64)
            if k == "fn1":
                return _FUNCS1[n[1]](ev(n[2]))
            return _FUNCS2[n[1]](ev(n[2]), ev(n[3]))

        out = ev(self._ast)
        if np.isscalar(out):
            out = np.full(len(env["_score"]), float(out))
        return np.asarray(out, dtype=np.float64)


def spec_fields(specs: list[dict]) -> list[str]:
    """Every docmeta column a spec list reads (function fields, filter
    fields, script identifiers) — what the term engine hydrates."""
    out: list[str] = []

    def add(f):
        if f and f not in out:
            out.append(f)

    for s in specs:
        if s["type"] in ("field_value_factor", "decay", "random_score",
                         "rank_feature", "distance_feature"):
            add(s.get("field", "orig_id" if s["type"] == "random_score"
                else None))
        elif s["type"] == "script_score":
            for f in ScriptExpr(s["script"]).fields:
                add(f)
        flt = s.get("filter")
        if flt:
            add(flt["field"])
    return out


def _function_values(
    spec: dict, base: np.ndarray, value_of
) -> np.ndarray:
    """Raw function value per candidate (before the weight multiplier)."""
    from .engine import apply_decay, apply_fvf_modifier

    t = spec["type"]
    if t == "field_value_factor":
        v = value_of(spec["field"]).astype(np.float64)
        nanm = np.isnan(v)
        if nanm.any():
            v = np.where(nanm, float(spec.get("missing", 1.0)), v)
        return apply_fvf_modifier(
            v, float(spec.get("factor", 1.0)), spec.get("modifier", "none")
        )
    if t == "decay":
        v = value_of(spec["field"]).astype(np.float64)
        f = apply_decay(
            v, spec["function"], float(spec["origin"]), float(spec["scale"]),
            float(spec.get("offset", 0.0)), float(spec.get("decay", 0.5)),
        )
        nanm = np.isnan(v)
        if nanm.any():
            f = np.where(nanm, 1.0, f)  # missing field → 1.0 (ES decay)
        return f
    if t == "weight":
        return np.ones(len(base), np.float64)
    if t == "script_score":
        expr = ScriptExpr(spec["script"])
        env = {"_score": base}
        for f in expr.fields:
            env[f] = value_of(f).astype(np.float64)
        return expr(env)
    if t == "random_score":
        from ..ops.sampling import knuth_hash_u32

        ids = value_of(spec.get("field", "orig_id")).astype(np.int64)
        h = knuth_hash_u32(ids + int(spec.get("seed", 0)))
        return h.astype(np.float64) / 4294967296.0
    if t == "rank_feature":
        # ES ``rank_feature`` query (usually a bool should clause →
        # score ADDS; run with score_mode="sum", boost_mode="sum").
        # Feature values are positive by mapping contract; docs missing
        # the feature (NaN) or non-positive contribute 0 — they simply
        # don't match the rank_feature clause.
        v = value_of(spec["field"]).astype(np.float64)
        fn = spec.get("function", "saturation")
        with np.errstate(invalid="ignore", divide="ignore"):
            if fn == "saturation":
                piv = float(spec["pivot"])
                f = v / (v + piv)
            elif fn == "log":
                sc = float(spec.get("scaling_factor", 1.0))
                f = np.log(sc + v)
            elif fn == "sigmoid":
                piv = float(spec["pivot"])
                e = float(spec["exponent"])
                ve = np.power(v, e)
                f = ve / (ve + piv ** e)
            else:
                raise ValueError(f"unknown rank_feature function {fn!r}")
        return np.where(np.isnan(v) | (v <= 0.0), 0.0, f)
    if t == "distance_feature":
        # ES ``distance_feature``: pivot/(pivot + |value − origin|) —
        # date fields read as epoch MICROS doc values (repo invariant),
        # so origin/pivot for dates are micros too.  Missing → 0 (the
        # doc doesn't match the clause).
        v = value_of(spec["field"]).astype(np.float64)
        piv = float(spec["pivot"])
        org = float(spec["origin"])
        f = piv / (piv + np.abs(v - org))
        return np.where(np.isnan(v), 0.0, f)
    raise ValueError(f"unknown function_score function type {t!r}")


def _filter_mask(spec: dict, n: int, value_of_raw) -> np.ndarray:
    from .qs import meta_pred_mask

    flt = spec.get("filter")
    if not flt:
        return np.ones(n, dtype=bool)
    pred = ("term", str(flt["term"])) if "term" in flt \
        else ("range",) + tuple(flt["range"])
    return meta_pred_mask(value_of_raw(flt["field"]), pred)


def combine_function_score(
    base: np.ndarray,
    specs: list[dict],
    value_of_raw,
    score_mode: str = "multiply",
    boost_mode: str = "multiply",
    max_boost: float | None = None,
) -> np.ndarray:
    """The multi-function kernel: per candidate doc, combine the
    MATCHING functions' (weighted) values per ``score_mode``, cap at
    ``max_boost``, apply to the query score per ``boost_mode``.  Docs
    matching no function keep ``base`` untouched.  ``value_of_raw(f)``
    returns candidate-aligned RAW doc values (numerics float with NaN
    missing; keywords object arrays)."""
    n = len(base)
    parts = []  # (mask, weighted_values, weight)
    for spec in specs:
        mask = _filter_mask(spec, n, value_of_raw)
        w = float(spec.get("weight", 1.0))
        vals = _function_values(spec, base, value_of_raw) * w
        parts.append((mask, vals, w))
    has = np.zeros(n, dtype=bool)
    if score_mode == "multiply":
        factor = np.ones(n, np.float64)
        for m, v, _ in parts:
            factor[m] *= v[m]
            has |= m
    elif score_mode == "sum":
        factor = np.zeros(n, np.float64)
        for m, v, _ in parts:
            factor[m] += v[m]
            has |= m
    elif score_mode == "avg":
        num = np.zeros(n, np.float64)
        den = np.zeros(n, np.float64)
        for m, v, w in parts:
            num[m] += v[m]
            den[m] += w
            has |= m
        factor = np.divide(num, den, out=np.zeros(n), where=den > 0)
    elif score_mode == "max":
        factor = np.full(n, -np.inf)
        for m, v, _ in parts:
            np.maximum(factor, np.where(m, v, -np.inf), out=factor)
            has |= m
    elif score_mode == "min":
        factor = np.full(n, np.inf)
        for m, v, _ in parts:
            np.minimum(factor, np.where(m, v, np.inf), out=factor)
            has |= m
    elif score_mode == "first":
        factor = np.zeros(n, np.float64)
        for m, v, _ in parts:
            take = m & ~has
            factor[take] = v[take]
            has |= m
    else:
        raise ValueError(f"unknown score_mode {score_mode!r}")
    if max_boost is not None:
        factor = np.minimum(factor, float(max_boost))
    if boost_mode == "multiply":
        out = base * factor
    elif boost_mode == "sum":
        out = base + factor
    elif boost_mode == "avg":
        out = (base + factor) / 2.0
    elif boost_mode == "max":
        out = np.maximum(base, factor)
    elif boost_mode == "min":
        out = np.minimum(base, factor)
    elif boost_mode == "replace":
        out = factor
    else:
        raise ValueError(f"unknown boost_mode {boost_mode!r}")
    return np.where(has, out, base)

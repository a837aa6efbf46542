"""ES search templates — the mustache subset ES actually documents for
``_search/template``: ``{{var}}`` substitution, ``{{#var}}...{{/var}}``
conditional sections (rendered when the param is truthy), and
``{{^var}}...{{/var}}`` inverted sections (rendered when absent/falsy).
``render_template`` produces the query string; pair it with any engine
search method.  (ES stores templates in the cluster state; here the
template is just a string the caller owns — storage is the caller's
config, matching the repo's strings-travel philosophy.)"""

from __future__ import annotations

import re

_SECTION_RX = re.compile(
    r"\{\{([#^])\s*([\w.]+)\s*\}\}(.*?)\{\{/\s*\2\s*\}\}", re.S
)
_VAR_RX = re.compile(r"\{\{\s*([\w.]+)\s*\}\}")


def render_template(source: str, params: dict | None = None) -> str:
    """Render a mustache-subset template.  Missing variables render
    empty (mustache semantics); sections nest (innermost-first via
    repeated passes)."""
    params = params or {}

    def truthy(name: str) -> bool:
        v = params.get(name)
        return bool(v) and v != 0

    prev = None
    out = source
    while prev != out:  # resolve nested sections to a fixpoint
        prev = out
        out = _SECTION_RX.sub(
            lambda m: (m.group(3) if (m.group(1) == "#") == truthy(m.group(2))
                       else ""),
            out,
        )
    return _VAR_RX.sub(
        lambda m: str(params.get(m.group(1), "")), out
    )

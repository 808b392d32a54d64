"""Configuration + query-dict normalization.

Reference parity: ``/root/reference/dbcut/configuration.py:16-58`` merges
``DEFAULT_CONFIG`` into the YAML config; per-query defaults
(``default_limit``, ``default_backref_limit``, ``default_join_depth``,
``default_backref_depth``, ``global_exclude``) are folded into each query
dict by ``/root/reference/dbcut/parser.py:117-139``. ``limit: no`` disables
the limit. ``${VAR}`` env expansion mirrors
``/root/reference/dbcut/utils.py:269-274``.
"""

from __future__ import annotations

import os
import string
from dataclasses import dataclass, field
from typing import Any

DEFAULT_CONFIG: dict[str, Any] = {
    "default_limit": 10,
    "default_backref_limit": 50,
    "default_backref_depth": 5,
    "default_join_depth": 5,
    "global_exclude": [],
    "cache": "~/.cache/dbcut_spark",
    "queries": [],
}


def expand_env_variables(value: Any) -> Any:
    """Recursively expand ``${VAR}`` in strings. A reference to an
    unset variable raises ``KeyError`` naming it — strict parity with
    the reference's ``Template.substitute`` + ``UndefinedError``
    (``/root/reference/dbcut/utils.py:269-274``, exercised by its
    ``test_expand_env_variables``); the old safe_substitute silently
    forwarded the literal ``${VAR}`` into connection URIs."""
    if isinstance(value, str):
        tpl = string.Template(value)
        # strict check FIRST, independent of substitution: every real
        # placeholder must resolve. (The old substitute()-then-fall-
        # back-to-safe_substitute path silently forwarded ${UNSET}
        # whenever an unrelated non-placeholder '$' raised ValueError
        # earlier in the string — exactly the bug strictness was for.)
        for m in tpl.pattern.finditer(value):
            name = m.group("named") or m.group("braced")
            if name is not None and name not in os.environ:
                raise KeyError(
                    f"undefined environment variable {name!r} in config "
                    f"value {value!r}"
                )
        # all placeholders resolvable — safe_substitute leaves any
        # non-placeholder '$' (e.g. a literal '$%') alone
        return tpl.safe_substitute(os.environ)
    if isinstance(value, dict):
        return {k: expand_env_variables(v) for k, v in value.items()}
    if isinstance(value, list):
        return [expand_env_variables(v) for v in value]
    return value


@dataclass
class QuerySpec:
    """Normalized extraction query (the reference's per-query YAML dict
    after defaults merging)."""

    from_table: str
    where: dict | None = None
    order_by: list[str] | str | None = None
    offset: int | None = None
    limit: int | None = 10
    backref_limit: int | None = 50
    join_depth: int = 5
    backref_depth: int = 5
    exclude: list[str] = field(default_factory=list)
    include: list[str] = field(default_factory=list)
    # "per_parent" (deterministic, default) or "global" (strict parity
    # with the reference's per-batch-statement LIMIT — SURVEY.md §7.3.3)
    backref_limit_mode: str = "per_parent"

    def cache_dict(self) -> dict:
        """Canonical dict for content-addressed cache keying (D4)."""
        return {
            "from": self.from_table,
            "where": self.where,
            "order_by": self.order_by,
            "offset": self.offset,
            "limit": self.limit,
            "backref_limit": self.backref_limit,
            "join_depth": self.join_depth,
            "backref_depth": self.backref_depth,
            "exclude": sorted(self.exclude),
            "include": sorted(self.include),
            "backref_limit_mode": self.backref_limit_mode,
        }


def _parse_limit(value: Any, default: int | None) -> int | None:
    if value is None:
        return default
    # explicit type checks: `0 in ("no", "none", False)` is TRUE under
    # Python's int/bool equality, which silently turned `limit: 0`
    # (return nothing) into no-limit-at-all (return everything)
    if value is False or (
        isinstance(value, str) and value.lower() in ("no", "none")
    ):
        return None
    if value is True:
        # YAML `limit: yes` parses as boolean True; int(True) would
        # silently mean limit=1 — the symmetric spelling of `limit: no`
        # has no sensible numeric reading, so reject it
        raise ValueError(
            "limit: yes is ambiguous - use a number, or 'no' for unlimited"
        )
    return int(value)


def normalize_query(raw: dict, config: dict | None = None) -> QuerySpec:
    """Merge config defaults into a raw query dict → QuerySpec.

    Mirrors ``/root/reference/dbcut/parser.py:117-139``: per-query values
    win; ``exclude`` is the union of query-level and ``global_exclude``.
    """
    cfg = dict(DEFAULT_CONFIG)
    cfg.update(config or {})
    raw = expand_env_variables(dict(raw))
    if "from" not in raw:
        raise ValueError("query needs a 'from:' table")
    limit = _parse_limit(raw.get("limit"), cfg["default_limit"])
    backref_limit = _parse_limit(raw.get("backref_limit"), cfg["default_backref_limit"])
    include = list(raw.get("include") or [])
    spec = QuerySpec(
        from_table=raw["from"],
        where=raw.get("where"),
        order_by=raw.get("order-by", raw.get("order_by")),
        # int-coerce like the depths: an env-expanded '20' would reach
        # DataFrame.offset as a string and raise downstream while the
        # SQL oracle happily interpolated it
        offset=(None if raw.get("offset") is None else int(raw["offset"])),
        limit=limit,
        backref_limit=backref_limit,
        join_depth=int(raw.get("join_depth", cfg["default_join_depth"])),
        backref_depth=int(raw.get("backref_depth", cfg["default_backref_depth"])),
        exclude=sorted(set(raw.get("exclude") or []) | set(cfg["global_exclude"] or [])),
        include=include,
        backref_limit_mode=str(raw.get("backref_limit_mode", "per_parent")),
    )
    if spec.backref_limit_mode not in ("per_parent", "global"):
        raise ValueError(f"backref_limit_mode must be per_parent|global, got {spec.backref_limit_mode!r}")
    if include:
        # reference: include sets both depths unlimited
        # (/root/reference/dbcut/parser.py:165-166)
        spec.join_depth = 10**6
        spec.backref_depth = 10**6
    return spec


def load_config(path: str) -> dict:
    """Load + env-expand a YAML config. The ``queries`` subtree is NOT
    expanded here: normalize_query expands each query once at plan
    time (the Engine front door's only pass), and expanding both
    places broke the documented ``$$`` escape ('$$NAME' → '$NAME' →
    substituted/KeyError on the second pass) and re-expanded '$'
    arriving inside env-var VALUES (round-10 review)."""
    import yaml

    with open(path) as f:
        cfg = dict(DEFAULT_CONFIG)
        cfg.update(yaml.safe_load(f) or {})
    queries = cfg.pop("queries", None)
    cfg = expand_env_variables(cfg)
    if queries is not None:
        cfg["queries"] = queries
    return cfg

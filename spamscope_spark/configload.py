"""Config loading: keyword dicts/lists and expiring whitelists.

Reference semantics:
- load_keywords_dict / load_keywords_list merge multiple YAML files and
  lowercase everything (utils.py:223-266; tests/test_utils.py:287-318:
  non-string/list values raise).
- load_whitelist merges domain lists; a list with an `expiry` timestamp
  in the past contributes NOTHING (utils.py:400-446;
  tests/test_utils.py:364-386).

In the streaming pipeline these configs are broadcast per microbatch
(foreachBatch refresh) — the tick-tuple hot-reload analog
(abstracts.py:83-85).
"""

from __future__ import annotations

import datetime as dt
from typing import Any

try:
    import yaml
except ImportError:  # pragma: no cover - pyyaml is present in this env
    yaml = None


def _load_yaml(path: str) -> Any:
    with open(path) as f:
        return yaml.safe_load(f)


def load_keywords_list(sources: dict[str, str | list]) -> list[str]:
    """Merge keyword lists from files or inline lists; lowercase;
    non-list content raises RuntimeError (reference behavior)."""
    out: set[str] = set()
    for _, src in sorted(sources.items()):
        data = _load_yaml(src) if isinstance(src, str) else src
        if not isinstance(data, list):
            raise RuntimeError(f"keyword list source must be a list, got {type(data)}")
        out |= {str(k).lower() for k in data}
    return sorted(out)


def load_keywords_dict(sources: dict[str, str | dict]) -> dict[str, list[str]]:
    """Merge target dicts (name → keyword list); lowercase values."""
    out: dict[str, set[str]] = {}
    for _, src in sorted(sources.items()):
        data = _load_yaml(src) if isinstance(src, str) else src
        if not isinstance(data, dict):
            raise RuntimeError(f"keyword dict source must be a dict, got {type(data)}")
        for name, kws in data.items():
            if not isinstance(kws, list):
                raise RuntimeError(f"target {name!r} value must be a list")
            out.setdefault(str(name), set()).update(str(k).lower() for k in kws)
    return {k: sorted(v) for k, v in out.items()}


def load_whitelist(
    sources: dict[str, dict],
    now: dt.datetime | None = None,
) -> set[str]:
    """Merge whitelist domain sets; skip sources whose `expiry` is in
    the past. `now` is injectable for determinism (the reference reads
    the wall clock — utils.py:435-441)."""
    now = now or dt.datetime.now(dt.timezone.utc)
    out: set[str] = set()
    for _, spec in sorted(sources.items()):
        expiry = spec.get("expiry")
        if expiry is not None:
            exp = dt.datetime.fromisoformat(str(expiry).replace("Z", "+00:00"))
            if exp.tzinfo is None:
                exp = exp.replace(tzinfo=dt.timezone.utc)
            if exp <= now:
                continue
        src = spec["path"] if "path" in spec else spec["values"]
        data = _load_yaml(src) if isinstance(src, str) else src
        if not isinstance(data, list):
            raise RuntimeError("whitelist source must be a list")
        out |= {str(d).lower() for d in data}
    return out

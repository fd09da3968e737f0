"""Configuration machinery: typed control dataclasses + specfile loader.

Replaces GALAHAD's three-layer config system (SURVEY §5.6):
  1. per-package ``PKG_control_type`` derived types with defaults
     (e.g. reference src/cqp/cqp.f90:134) -> frozen dataclasses here;
  2. specfiles ``! keyword value`` parsed by PKG_read_specfile
     (reference src/specfile/specfile.f90:967) -> :func:`read_specfile` /
     :func:`apply_specfile`, keeping GALAHAD keyword spelling
     (lower-case, ``-`` separated) for migration parity;
  3. buildspec templates -> :func:`write_specfile_template`.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Mapping


def control(cls):
    """Decorator: a frozen control dataclass (nested configs allowed)."""
    return dataclasses.dataclass(frozen=True)(cls)


def _keyword(field_name: str) -> str:
    """GALAHAD specfile keyword for a dataclass field name.

    The reference maps e.g. control%stop_abs_p to keyword
    'primal-accuracy-required' etc.; we use the direct mapping
    field_name -> 'field-name' uniformly, which keeps a 1:1 discoverable
    correspondence (the reference's ad-hoc names are aliased per-solver
    where parity matters).
    """
    return field_name.replace("_", "-")


def read_specfile(path_or_text: str) -> dict[str, str]:
    """Parse a GALAHAD-style specfile into {keyword: value-string}.

    Grammar (reference src/specfile/specfile.f90): comment lines start
    with '!'; each active line is ``keyword [value]``; BEGIN/END section
    markers group per-package options — sections are flattened into
    'section.keyword' keys here.
    """
    try:
        with open(path_or_text) as fh:
            text = fh.read()
    except (OSError, ValueError):
        text = path_or_text
    out: dict[str, str] = {}
    section = ""
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("!") or line.startswith("*"):
            continue
        parts = line.split(None, 1)
        head = parts[0].upper()
        if head == "BEGIN":
            section = parts[1].strip().lower().replace(" ", "-") if len(parts) > 1 else ""
            continue
        if head == "END":
            section = ""
            continue
        key = parts[0].lower()
        val = parts[1].split("!")[0].strip() if len(parts) > 1 else "yes"
        out[f"{section}.{key}" if section else key] = val
    return out


def _coerce(value: str, target: Any) -> Any:
    if isinstance(target, bool):
        return value.strip().lower() in ("yes", "true", "t", "on", "1", ".true.")
    if isinstance(target, int):
        return int(float(value.replace("D", "E").replace("d", "e")))
    if isinstance(target, float):
        return float(value.replace("D", "E").replace("d", "e"))
    return value


def apply_specfile(ctrl: Any, spec: Mapping[str, str], section: str = "") -> Any:
    """Return a copy of control dataclass ``ctrl`` with specfile overrides.

    Nested control dataclasses are addressed by their field name as the
    specfile section (mirroring the reference's nested sections,
    src/cqp/cqp.f90:1139-1169).
    """
    updates: dict[str, Any] = {}
    for f in dataclasses.fields(ctrl):
        cur = getattr(ctrl, f.name)
        if dataclasses.is_dataclass(cur):
            sub = apply_specfile(cur, spec, section=f.name)
            if sub != cur:
                updates[f.name] = sub
            continue
        for key in (_keyword(f.name), f.name):
            full = f"{section}.{key}" if section else key
            if full in spec:
                updates[f.name] = _coerce(spec[full], cur)
                break
    return dataclasses.replace(ctrl, **updates) if updates else ctrl


def write_specfile_template(ctrl: Any, name: str) -> str:
    """Render a control dataclass as a specfile template (buildspec
    equivalent, reference src/buildspec/buildspec.f90:11-31)."""
    lines = [f"BEGIN {name}"]
    for f in dataclasses.fields(ctrl):
        cur = getattr(ctrl, f.name)
        if dataclasses.is_dataclass(cur):
            continue
        lines.append(f"!  {_keyword(f.name)}  {cur}")
    lines.append(f"END {name}")
    return "\n".join(lines)

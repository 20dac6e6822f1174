"""Code→label map sidecars (reference maps.json format).

The reference ships a 1.9 MB ``maps.json``: one object whose keys are
column names and values are {code: label} dicts (72 of them, built in
maps.ipynb from literal dicts and lookup CSVs). This module loads that
format and provides the map-building helpers the notebook performed
offline — composite meso/micro keys (f"{uf}{code:02d}") and aliased
keys sharing one dict (e.g. CO_UF_NASC = CO_UF).

Reference: transform/maps.json; maps.ipynb cells 5-13 (structure
documented in SURVEY.md §1).
"""

from __future__ import annotations

import json
from typing import Mapping

BOOL_MAP = {"0": "false", "1": "true"}  # decoded separately; kept for parity docs


def load_maps(path: str) -> dict[str, dict[str, str]]:
    """Load a maps.json-format sidecar: {column: {code: label}}."""
    with open(path, encoding="utf-8") as f:
        raw = json.load(f)
    return {col: {str(k): str(v) for k, v in m.items()} for col, m in raw.items()}


def alias_maps(maps: dict[str, dict[str, str]], aliases: Mapping[str, str]) -> dict[str, dict[str, str]]:
    """Register alias columns pointing at an existing dict
    (maps.ipynb cell 13: CO_UF_NASC = CO_UF, TP_SITUACAO_CURSO_2/3 = _1)."""
    out = dict(maps)
    for new, src in aliases.items():
        out[new] = maps[src]
    return out


def composite_key_map(
    base: Mapping[str, str], uf_codes: Mapping[str, str], width: int
) -> dict[str, str]:
    """Build meso/micro-style composite maps: key = f"{uf}{code:0{width}d}"
    (maps.ipynb cell 13). ``base`` maps the short code per UF to a label."""
    return {
        f"{uf}{int(code):0{width}d}": label
        for uf in uf_codes
        for code, label in base.items()
    }

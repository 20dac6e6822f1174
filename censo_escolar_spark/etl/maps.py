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

import csv
import json
from typing import Iterable, Mapping, Tuple

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
    rows: Iterable[Tuple[str, str, str]], width: int
) -> dict[str, str]:
    """Build meso/micro-style composite maps from (uf, code, label)
    triples: key = f"{uf}{code:0{width}d}" (maps.ipynb cell 13 — meso
    width 2, micro width 3). The short code is only unique WITHIN a UF
    (meso 2 in RO is "Leste Rondoniense"; meso 2 elsewhere is a different
    region), hence the per-row triple, not a base map replicated per UF.
    First occurrence wins, matching pandas drop_duplicates in the
    notebook. Rows with a blank uf or code (',,'-padded lookup lines —
    the same padding parse_lookup_csv skips) are skipped, not fatal."""
    out: dict[str, str] = {}
    for uf, code, label in rows:
        if not str(uf).strip() or not str(code).strip():
            continue
        out.setdefault(f"{uf}{int(code):0{width}d}", str(label))
    return out


#: ufs.csv positional layout (reference transform/tables/ufs.csv):
#: (region_code, region_name, uf_code, uf_name, uf_abbrev,
#:  meso_code, meso_name, micro_code, micro_name, mun_code, mun_name)
_UFS_SIMPLE = {"CO_REGIAO": (0, 1), "CO_UF": (2, 3), "CO_MUNICIPIO": (9, 10)}
_UFS_COMPOSITE = {"CO_MESORREGIAO": (2, 5, 6, 2), "CO_MICRORREGIAO": (2, 7, 8, 3)}


def maps_from_ufs_csv(path: str) -> dict[str, dict[str, str]]:
    """Build the five geography maps the reference derives from ufs.csv
    (maps.ipynb cell 13): CO_REGIAO / CO_UF / CO_MUNICIPIO as plain
    code→name dicts, CO_MESORREGIAO / CO_MICRORREGIAO as composite
    f"{uf}{code:02d}" / f"{uf}{code:03d}" keys. Driver-side: the file is
    a ~5,600-row lookup sidecar, not data."""
    with open(path, encoding="utf-8", newline="") as f:
        reader = csv.reader(f)
        next(reader)  # header
        rows = [r for r in reader if len(r) >= 11]
    maps: dict[str, dict[str, str]] = {}
    for name, (k, v) in _UFS_SIMPLE.items():
        m: dict[str, str] = {}
        for r in rows:
            m.setdefault(r[k].strip(), r[v].strip())
        maps[name] = m
    for name, (uf, code, label, width) in _UFS_COMPOSITE.items():
        maps[name] = composite_key_map(
            ((r[uf].strip(), r[code].strip(), r[label].strip()) for r in rows),
            width,
        )
    return maps


def parse_lookup_csv(path: str) -> dict[str, str]:
    """Load a 2-column code,label lookup CSV (reference
    transform/tables/CO_IES.csv etc.; maps.ipynb parse_csv). Blank or
    code-less rows (CO_AREA_CURSO.csv pads with ',,') are skipped."""
    with open(path, encoding="utf-8", newline="") as f:
        reader = csv.reader(f)
        next(reader)  # header
        out: dict[str, str] = {}
        for r in reader:
            if len(r) >= 2 and r[0].strip():
                out.setdefault(r[0].strip(), r[1].strip())
    return out

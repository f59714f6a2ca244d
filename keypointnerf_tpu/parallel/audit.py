"""Compiled-HLO collective audit.

Multi-chip hardware is not reachable from CI, but the collective schedule
XLA compiles for the sharded programs IS — and the scaling story lives or
dies there. This module parses compiled HLO and inventories every
cross-device collective with its payload bytes so tests can assert the
schedule is exactly the intended one:

  * sharded train step — ONE fused gradient all-reduce of ~param bytes
    (+ scalar metric reductions); NO all-gathers (params are replicated,
    the batch is consumed where it lives), no all-to-alls.
  * tile-sharded render — ONE all-gather of ~output-image bytes; no
    all-reduces of tensor payloads.

Anything beyond that inventory is an accidental reshard — the class of
regression (e.g. a stray `with_sharding_constraint`, a donated-buffer
layout change) that silently multiplies step latency on a real pod while
every numeric test stays green. docs/SCALING.md turns the audited bytes
into a bandwidth model for the >=85% 1->4-host target.

The reference has no analog: its scaling story is Lightning
`strategy="ddp"` (reference train.py:71) with whatever NCCL does.
"""
from __future__ import annotations

import re
from typing import Dict, List

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
    "c64": 8, "c128": 16,
}

_ARRAY_RE = re.compile(r"(\w+)\[([\d,]*)\]")
_COLLECTIVES = (
    "all-reduce", "all-gather", "reduce-scatter", "collective-permute",
    "all-to-all", "collective-broadcast",
)
# `%name = <shape> <op>(` or `... <op>-start(`; -done ops repeat the shape
# of their -start and must not be double-counted
_OP_RE = re.compile(
    r"=\s*((?:\([^)]*\)|[\w\[\],{}: ]+?))\s+"
    r"(" + "|".join(_COLLECTIVES) + r")(-start)?\("
)


def _shape_bytes(shape_text: str) -> int:
    """Total bytes of an HLO result type (array or flat tuple of arrays)."""
    total = 0
    for dtype, dims in _ARRAY_RE.findall(shape_text):
        if dtype not in _DTYPE_BYTES:
            continue  # token[] etc.
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def collective_inventory(hlo_text: str) -> Dict[str, List[dict]]:
    """Inventory the collectives of a compiled HLO module.

    Returns {op_name: [{"bytes": int, "shape": str}, ...]} with one entry
    per collective instruction (async start/done pairs counted once).
    """
    inv: Dict[str, List[dict]] = {}
    for m in _OP_RE.finditer(hlo_text):
        shape, op = m.group(1).strip(), m.group(2)
        inv.setdefault(op, []).append(
            {"bytes": _shape_bytes(shape), "shape": shape}
        )
    return inv


def total_bytes(inv: Dict[str, List[dict]], op: str) -> int:
    return sum(e["bytes"] for e in inv.get(op, []))


def format_inventory(inv: Dict[str, List[dict]]) -> str:
    lines = []
    for op in sorted(inv):
        entries = inv[op]
        lines.append(
            f"{op}: {len(entries)} op(s), {sum(e['bytes'] for e in entries)} B"
        )
        for e in entries:
            lines.append(f"  {e['bytes']:>12,} B  {e['shape']}")
    return "\n".join(lines) or "(no collectives)"

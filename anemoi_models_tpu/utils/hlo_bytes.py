"""HBM-traffic accounting from optimized HLO.

``cost_analysis()['bytes accessed']`` counts every HLO op's operands and
results BEFORE fusion — elementwise intermediates that fusion never
materializes are charged anyway, which is how round-4's bench reported a
physically meaningless 173% of roofline (VERDICT round 4). The defensible
estimate reads the *optimized* module: after fusion, each top-level
instruction of the entry computation reads its operands from HBM and writes
its result once — for tensors far larger than VMEM (this model's node/slot
tensors are tens of MB against ~100 KB of vector memory) that IS the
executed traffic schedule.

``hbm_bytes(compiled_text)`` sums result + operand bytes over the entry
computation's instructions, skipping parameters/constants (reads are charged
at the consumer) and pure layout/bookkeeping ops (tuple/get-tuple-element/
bitcast — no data movement).
"""

from __future__ import annotations

import re

__all__ = ["hbm_bytes"]

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8, "c64": 8,
    "c128": 16, "s4": 1, "u4": 1, "f8e4m3fn": 1, "f8e5m2": 1,
}

# one typed shape, e.g. bf16[40320,256]{1,0}
_SHAPE = re.compile(r"(\w+)\[([0-9,]*)\]")
# an instruction definition: [ROOT] %name = <shape-or-tuple> opcode(...)
_DEF = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.-]+)\s*=\s*(\(?[\w\[\],{}\s/#*]*?\)?)\s+([\w-]+)\(")
# operand references inside the parens: %name
_OPERAND = re.compile(r"%([\w.-]+)")

# no HBM data movement of their own
_FREE_OPS = {
    "parameter", "constant", "tuple", "get-tuple-element", "bitcast",
    "after-all", "partition-id", "replica-id", "iota",
}


def _shape_bytes(text: str) -> int:
    total = 0
    for dtype, dims in _SHAPE.findall(text):
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def hbm_bytes(hlo_text: str) -> int:
    """Estimated HBM bytes moved by one execution of the optimized module.

    Sums, over the ENTRY computation's instructions: result bytes (one
    write) plus each operand's bytes (one read per use). Parameters and
    constants contribute only where consumed; tuple plumbing and bitcasts
    are free. Nested (fusion) computations are intentionally not walked —
    their internals live in registers/VMEM, which is the entire point of
    counting post-fusion.
    """
    # isolate the entry computation: "ENTRY %name (...) -> ... {" .. matching "}"
    m = re.search(r"^ENTRY\b[^\n]*\{", hlo_text, re.M)
    if m is None:
        raise ValueError("no ENTRY computation in HLO text")
    body_start = m.end()
    body_end = hlo_text.find("\n}", body_start)
    body = hlo_text[body_start : body_end if body_end != -1 else None]

    shapes: dict[str, int] = {}
    total = 0
    for line in body.splitlines():
        d = _DEF.match(line)
        if not d:
            continue
        name, shape_text, opcode = d.groups()
        nbytes = _shape_bytes(shape_text)
        shapes[name] = nbytes
        if opcode in _FREE_OPS:
            continue
        total += nbytes  # one result write
        # operand reads: names referenced after the opcode's open paren
        args = line[d.end() :]
        # strip metadata/backend-config tails (operand list ends at first ')')
        depth, cut = 1, len(args)
        for i, ch in enumerate(args):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    cut = i
                    break
        for op_name in _OPERAND.findall(args[:cut]):
            total += shapes.get(op_name, 0)
    return total

"""Checkpoint offsets-log inspection (r13, factored per review — this
logic was copy-pasted at five call sites and format-handling drift was
inevitable).

Structured Streaming's checkpoint is the ground truth for what a query
consumed: one ``offsets/<batchId>`` file per CONSTRUCTED micro-batch,
written BEFORE the batch executes (so it exists whenever the batch's
sink effects are visible — the property that makes batch counting
race-free, unlike ``recentProgress`` which appends at trigger END), and
one ``commits/<batchId>`` file after the batch commits. The offsets
file's last non-blank line is the source's offset JSON; Python data
sources may double-encode it (a JSON string containing JSON).
"""

from __future__ import annotations

import json
import os


def offsets_log(ckpt: str) -> list[tuple[int, dict]]:
    """(batch_id, offset-dict) per constructed batch, batch order."""
    odir = os.path.join(ckpt, "offsets")
    if not os.path.isdir(odir):
        return []
    out: list[tuple[int, dict]] = []
    for f in sorted(
        (f for f in os.listdir(odir) if f.isdigit()), key=int
    ):
        with open(os.path.join(odir, f)) as fh:
            lines = [ln for ln in fh.read().splitlines() if ln.strip()]
        off = json.loads(lines[-1])
        if isinstance(off, str):  # double-encoded Python-source offset
            off = json.loads(off)
        out.append((int(f), off))
    return out


def committed_batch_reached(ckpt: str, field: str, value) -> bool:
    """True once some COMMITTED batch's offset has ``field == value`` —
    the deterministic drain condition (poll this, then stop())."""
    cdir = os.path.join(ckpt, "commits")
    if not os.path.isdir(cdir):
        return False
    for bid, off in offsets_log(ckpt):
        if off.get(field) == value and os.path.exists(
            os.path.join(cdir, str(bid))
        ):
            return True
    return False


def n_advancing_batches(ckpt: str, field: str, start=0) -> int:
    """How many constructed batches ADVANCED the cursor — the race-free
    data-batch count (an idle retrigger plans no batch; a batch that
    re-reads the same cursor range would not advance and is counted
    zero, which is exactly the bug the count exists to expose)."""
    n, prev = 0, start
    for _bid, off in offsets_log(ckpt):
        v = off.get(field, start)
        if v > prev:
            n += 1
        prev = v
    return n

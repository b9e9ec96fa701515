#!/usr/bin/env python3
"""No-Spark host-scaling control: the identical extraction kernel driven by
a bare ``multiprocessing.Pool`` at a given process count.

Purpose: separate ENGINE scaling from HOST scaling.  The kernel is Python
string-heavy; on a shared single box, process counts past the memory-bus
saturation point stop scaling no matter how the work is scheduled.  This
control runs the exact same per-document kernel with zero Spark overhead,
so its N→4N efficiency is the host's ceiling for this workload class *in
the same measurement window*.  bench.py embeds the control next to the
Spark scaling block: an engine efficiency at-or-above the control ceiling
means the distributed plan adds no scaling penalty of its own — on a real
cluster, 4N executors add machines (separate memory buses), so the
cluster-size criterion tracks the engine number, not the shared-bus
ceiling.

Usage: python scripts/mp_control.py PROCS [N_DOCS] [REPS]
Prints one JSON line: {"procs": P, "sec": min-of-reps, "rep_secs": [...]}
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def work(doc_id: int) -> int:
    from pdf_craft_spark.corpus import (
        generate_document,
        pages_to_spans,
        parse_raw_spans,
    )
    from pdf_craft_spark.operators.document import extract_document

    pages = parse_raw_spans(pages_to_spans(generate_document(doc_id)))
    _md, spans = extract_document(pages)
    return len(spans)


def main() -> None:
    procs = int(sys.argv[1])
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 1200
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    # doc ids offset past the golden range: the default heavy-tail mix,
    # deterministic across runs and process counts
    ids = list(range(100, 100 + n_docs))
    rep_secs = []
    with mp.Pool(procs) as pool:
        pool.map(work, ids[: procs * 2])  # warm: imports + allocator
        for _ in range(reps):
            t = time.perf_counter()
            pool.map(work, ids, chunksize=max(1, n_docs // (procs * 8)))
            rep_secs.append(round(time.perf_counter() - t, 3))
    print(json.dumps({"procs": procs, "sec": min(rep_secs), "rep_secs": rep_secs}))


if __name__ == "__main__":
    main()

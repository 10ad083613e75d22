#!/usr/bin/env python3
"""Is the 50k device-only rate dispatch-bound or compute-bound?

tools/r50k_roofline.py measured 78.3k reads/s dispatching 64 separate
kernels against a resident buffer — but each dispatch is a relay RPC,
so the per-call overhead may hide inside "device compute". This probe
runs the SAME work as ONE dispatch: lax.scan over W stacked wire
batches (each iteration rolled by its index so XLA cannot hoist the
loop body), returning stacked heads. If the scan runs materially
faster per batch, the engine should dispatch scan-windows; if not, the
sort network itself is the floor and the 80k bar is a measured
negative on this chip.

Env: R50K_NODES, R50K_BS, R50K_STRIDE (8), SCAN_W (8), SCAN_REPS (8).
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/vstrains_tpu_jax"))
os.environ.setdefault("VSTRAINS_FORCE_BACKEND", "bench")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    n_nodes = int(os.environ.get("R50K_NODES", 50_000))
    bs = int(os.environ.get("R50K_BS", 16384))
    stride = int(os.environ.get("R50K_STRIDE", 8))
    W = int(os.environ.get("SCAN_W", 8))
    reps = int(os.environ.get("SCAN_REPS", 8))
    os.environ["VSTRAINS_SORTFILL_STRIDE"] = str(stride)

    import jax
    import jax.numpy as jnp
    from bench import synth_workload
    from vstrains_tpu.core.fastq import _pack
    from vstrains_tpu.ops.pe_infer import (_SPARSE_HEAD,
                                           _build_sortfill_payloads,
                                           _pack_wire_np,
                                           _sat_two_tier,
                                           _sortfill_node_bits,
                                           _sparse_sortfill_core,
                                           _unpack_wire,
                                           build_kmer_table)

    refs, fwd, rve, k = synth_workload(n_nodes=n_nodes, n_pairs=bs,
                                       node_len=200)
    fc, fl = _pack([s.encode() for s in fwd])
    rc, rl = _pack([s.encode() for s in rve])
    T = max(fc.shape[1], rc.shape[1])
    wire_np = _pack_wire_np(fc, fl, rc, rl, T)
    tbl = build_kmer_table(refs, k + 1)
    node_bits = _sortfill_node_bits(n_nodes)
    pays = jnp.asarray(_build_sortfill_payloads(tbl, node_bits))
    tab_h1 = jnp.asarray(tbl.h1_biased)
    seq_lens = jnp.asarray(tbl.seq_lens)
    depth = int(pays.shape[1])

    @partial(jax.jit, static_argnames=("T", "split_len", "depth", "cap",
                                       "num_nodes", "fill", "node_bits",
                                       "stride"))
    def scan_win(wires, tab_h1, seq_lens, pays, T, split_len, depth,
                 cap, num_nodes, fill, node_bits, stride):
        def body(carry, wire):
            codes, lens = _unpack_wire(wire, T)
            head, full = _sparse_sortfill_core(
                codes, lens, tab_h1, seq_lens, pays, split_len, depth,
                cap, num_nodes, fill, node_bits, stride)
            return carry, (head, full)

        _, (heads, fulls) = jax.lax.scan(body, jnp.int32(0), wires)
        return heads, fulls

    kw = dict(T=T, split_len=k + 1, depth=depth, cap=16,
              num_nodes=n_nodes, fill="cummin", node_bits=node_bits,
              stride=stride)
    # W distinct wire stacks (rolled copies) so the scan has real data
    wires_np = np.stack([np.roll(wire_np, i, axis=0) for i in range(W)])
    wires = jax.device_put(wires_np)
    jax.block_until_ready(wires)

    t0 = time.time()
    out = scan_win(wires, tab_h1, seq_lens, pays, **kw)
    np.asarray(out[0][0])
    warm = round(time.time() - t0, 1)

    t0 = time.time()
    for _ in range(reps):
        out = scan_win(wires, tab_h1, seq_lens, pays, **kw)
    np.asarray(out[0][0])
    dt = time.time() - t0
    rec = {"backend": jax.default_backend(), "W": W, "bs": bs,
           "stride": stride, "reps": reps, "warmup_s": warm,
           "scan_s": round(dt, 2),
           "scan_reads_per_s": round(reps * W * bs / dt, 1)}
    print(json.dumps(rec))


if __name__ == "__main__":
    main()

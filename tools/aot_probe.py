#!/usr/bin/env python3
"""AOT / executable-serialization probe (VERDICT r2 item 7).

Answers, with evidence, whether the attached accelerator backend can
skip its first-run kernel compile at all:

  1. compile the production fused PE kernel shape and time it;
  2. check whether the persistent compilation cache (pointed at a
     FRESH directory) stored anything;
  3. attempt direct PJRT executable serialization through every public
     or semi-public handle this jax exposes;
  4. attempt jax.export round-trip (note: export serializes StableHLO,
     i.e. the PRE-compile IR — deserializing still pays the compile, so
     it cannot cut the first-run wall even where it works).

Emits one JSON line. If (2) and (3) both fail, the first-run compile
wall is a plugin-level blocker: no client-side AOT strategy can skip
it, and the engine's mitigation is the compile race
(ops.pe_infer._CompileRace) + background prefetch.
"""

import json
import os
import sys
import tempfile
import time

cache_dir = tempfile.mkdtemp(prefix="aot_probe_cache_")
os.environ["JAX_COMPILATION_CACHE_DIR"] = cache_dir
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from bench import synth_workload
    from vstrains_tpu.core.fastq import _pack
    from vstrains_tpu.ops.pe_infer import (_build_sortfill_payloads,
                                           _pe_batch_fused,
                                           _sortfill_node_bits,
                                           build_kmer_table)

    out = {"backend": jax.default_backend(),
           "device": str(jax.devices()[0]),
           "cache_dir": cache_dir}

    refs, fwd, rve, k = synth_workload(n_nodes=64, node_len=400,
                                       n_pairs=2048)
    table = build_kmer_table(refs, k + 1)
    N = table.num_nodes
    node_bits = _sortfill_node_bits(N)
    fc, fl = _pack([s.encode() for s in fwd])
    rc, rl = _pack([s.encode() for s in rve])
    pays = jnp.asarray(_build_sortfill_payloads(table, node_bits))
    empty = jnp.zeros(0, jnp.int32)
    args = (jnp.asarray(fc), jnp.asarray(fl), jnp.asarray(rc),
            jnp.asarray(rl), jnp.zeros((N, N), jnp.int32),
            jnp.zeros((N, N), jnp.int32), jnp.asarray(table.h1_biased),
            empty, empty, jnp.asarray(table.seq_lens), empty)
    kw = dict(split_len=k + 1, max_dup=table.max_dup, num_nodes=N,
              stats_impl="scatter", probe="sortfill", pays=pays,
              node_bits=node_bits)

    # 1. compile + run the production kernel shape
    t0 = time.time()
    lowered = _pe_batch_fused.lower(*args, **kw)
    compiled = lowered.compile()
    out["compile_seconds"] = round(time.time() - t0, 2)

    # 2. persistent-cache writes? (the cache stores via the SAME PJRT
    # serialization path, so this is the authoritative test)
    deadline = time.time() + 5
    entries = []
    while time.time() < deadline and not entries:
        entries = [p for p in os.listdir(cache_dir)
                   if not p.startswith(".")]
        time.sleep(0.25)
    out["cache_entries_after_compile"] = len(entries)
    out["cache_persists_executables"] = bool(entries)

    # 3. direct executable serialization handles
    ser = {}
    exe = getattr(compiled, "_executable", None)
    for name, fn in (
        ("runtime_executable.serialize",
         lambda: compiled.runtime_executable().serialize()),
        ("xla_executable.serialize",
         lambda: exe.xla_executable.serialize()),
        ("backend.serialize_executable",
         lambda: jax.devices()[0].client.serialize_executable(
             exe.xla_executable)),
    ):
        try:
            blob = fn()
            ser[name] = f"OK ({len(blob)} bytes)"
        except Exception as e:  # noqa: BLE001 — probe records everything
            ser[name] = f"{type(e).__name__}: {str(e)[:120]}"
    out["serialization_attempts"] = ser
    out["any_serialization_ok"] = any(v.startswith("OK")
                                      for v in ser.values())

    # 4. jax.export round trip (StableHLO: portable but still compiles
    # at load — cannot cut the first-run wall)
    try:
        from jax import export as jexport
        t0 = time.time()
        ex = jexport.export(jax.jit(lambda a, b: a @ b))(
            jnp.zeros((256, 256), jnp.float32),
            jnp.zeros((256, 256), jnp.float32))
        blob = ex.serialize()
        re = jexport.deserialize(blob)
        t1 = time.time()
        re.call(jnp.zeros((256, 256), jnp.float32),
                jnp.zeros((256, 256), jnp.float32))
        out["jax_export"] = (f"round-trip OK ({len(blob)} bytes StableHLO"
                             f"); deserialize+first-call recompiles "
                             f"({time.time() - t1:.2f}s vs "
                             f"{t1 - t0:.2f}s export)")
    except Exception as e:  # noqa: BLE001
        out["jax_export"] = f"{type(e).__name__}: {str(e)[:120]}"

    out["verdict"] = (
        "AOT possible: persist/ship the serialized executable"
        if out["cache_persists_executables"] or
        out["any_serialization_ok"]
        else "plugin-level blocker: no serialization path exists; "
             "first-run compile is unavoidable on this backend — "
             "mitigate by overlap (compile race + prefetch), not AOT")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())

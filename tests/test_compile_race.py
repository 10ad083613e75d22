"""Guard tests for the PE compile race (ops/pe_infer._CompileRace).

Round-3 regression (VERDICT r3 weak #1): the race routed production
batches to the CPU backend while the accelerator kernel was ALREADY in
the in-process jit cache — the first CPU batch's synchronous compile
held jit's compile lock, starved the accelerator warm thread, and a
warm 3 s run took 60 s. These tests pin the fixed contract:

  * with a warm kernel cache, the race must route ZERO batches to the
    CPU backend and produce identical matrices;
  * raced wall-clock on a warm cache must be within 1.5x of race-off
    (the regression was 19.7x — the bound is generous for CI noise
    while still catching any repeat).

VSTRAINS_COMPILE_RACE=force enables the race on a CPU-default backend
(both "backends" are the host CPU), exercising the full routing path —
warm threads, buffering, take_ready_pending, drain_remaining — without
TPU hardware.
"""

import time

import numpy as np
import pytest

from vstrains_tpu.core.fastq import ReadPairBatch, _pack
from vstrains_tpu.ops import pe_infer


def _workload(n_pairs, n_nodes=20, node_len=400, read_len=120, k=21,
              seed=3):
    rng = np.random.RandomState(seed)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    refs = [bases[rng.randint(0, 4, node_len)].tobytes().decode()
            for _ in range(n_nodes)]
    w1 = rng.randint(0, n_nodes, size=n_pairs)
    w2 = rng.randint(0, n_nodes, size=n_pairs)
    p1 = rng.randint(0, node_len - read_len, size=n_pairs)
    p2 = rng.randint(0, node_len - read_len, size=n_pairs)
    fwd = [refs[w][p: p + read_len] for w, p in zip(w1, p1)]
    rve = [refs[w][p: p + read_len] for w, p in zip(w2, p2)]
    fc, fl = _pack([s.encode() for s in fwd])
    rc, rl = _pack([s.encode() for s in rve])
    batch = ReadPairBatch(fc, fl, rc, rl, 0, 0, n_pairs)
    ids = [str(i) for i in range(n_nodes)]
    return ids, refs, batch, k


@pytest.mark.slow
def test_race_never_loses_warm(monkeypatch):
    # > 65536 pairs so the small-workload gate doesn't bypass the race
    n_pairs = 70_000
    ids, refs, batch, k = _workload(n_pairs)
    bs = 8192

    # race off: compiles the kernel and warms the in-process jit cache
    monkeypatch.setenv("VSTRAINS_COMPILE_RACE", "0")
    pe_infer.infer_pe_links(ids, refs, batch, k, batch_size=bs)
    t0 = time.monotonic()
    base = pe_infer.infer_pe_links(ids, refs, batch, k, batch_size=bs)
    dt_off = time.monotonic() - t0

    # race forced on, warm cache: zero CPU batches, identical results
    monkeypatch.setenv("VSTRAINS_COMPILE_RACE", "force")
    t0 = time.monotonic()
    raced = pe_infer.infer_pe_links(ids, refs, batch, k, batch_size=bs)
    dt_on = time.monotonic() - t0

    assert np.array_equal(base.node_mat, raced.node_mat)
    assert np.array_equal(base.short_mat, raced.short_mat)
    assert pe_infer._LAST_RACE_STATS["cpu_batches"] == 0, (
        "compile race routed batches to the CPU backend despite a warm "
        "kernel cache — the round-3 regression is back")
    assert dt_on <= 1.5 * dt_off + 1.0, (
        f"raced warm run took {dt_on:.2f}s vs {dt_off:.2f}s race-off")


@pytest.mark.slow
def test_race_cold_cpu_progress_is_correct(monkeypatch):
    """With grace=0 and an artificially slowed accelerator warm, real
    batches drain through the CPU backend and the summed matrices stay
    bit-identical to a single-backend run."""
    n_pairs = 70_000
    ids, refs, batch, k = _workload(n_pairs, seed=11)
    bs = 8192

    monkeypatch.setenv("VSTRAINS_COMPILE_RACE", "0")
    base = pe_infer.infer_pe_links(ids, refs, batch, k, batch_size=bs)

    # delay the accel warm event so the CPU side must do real work
    orig_start = pe_infer._CompileRace.start_warm

    def slow_start(self, Tp):
        orig_start(self, Tp)
        ev = self._events[Tp]
        real_set, fired = ev.set, time.monotonic()
        ev.set = lambda: (time.sleep(
            max(0.0, 1.5 - (time.monotonic() - fired))), real_set())[1]

    monkeypatch.setattr(pe_infer._CompileRace, "start_warm", slow_start)
    monkeypatch.setenv("VSTRAINS_COMPILE_RACE", "force")
    monkeypatch.setenv("VSTRAINS_RACE_GRACE", "0")
    raced = pe_infer.infer_pe_links(ids, refs, batch, k, batch_size=bs)

    assert np.array_equal(base.node_mat, raced.node_mat)
    assert np.array_equal(base.short_mat, raced.short_mat)
    assert pe_infer._LAST_RACE_STATS["cpu_batches"] > 0, (
        "the slowed warm should have pushed at least one batch to the "
        "CPU side (grace=0)")


def _set_cache_dir(request, path):
    """Point jax's compilation cache dir at `path` for one test (the
    config attr is a property — monkeypatch.setattr cannot restore
    it)."""
    import jax

    prev = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", str(path))
    request.addfinalizer(
        lambda: jax.config.update("jax_compilation_cache_dir", prev))


def test_cache_has_kernel_signal(tmp_path, request):
    """_cache_has_kernel keys the warm grace off the persistent cache
    dir's contents: any jit__pe_batch_fused* executable present means a
    cache hit is plausible."""
    _set_cache_dir(request, tmp_path)
    assert not pe_infer._CompileRace._cache_has_kernel()
    (tmp_path / "jit__pe_batch_fused_wire-abc123-cache").write_bytes(b"x")
    assert pe_infer._CompileRace._cache_has_kernel()
    # unrelated entries don't trigger it
    for f in tmp_path.iterdir():
        f.unlink()
    (tmp_path / "jit_other_kernel-cache").write_bytes(b"x")
    assert not pe_infer._CompileRace._cache_has_kernel()


def _make_race(request, tmp_cache, with_kernel_file):
    import jax

    if with_kernel_file:
        (tmp_cache / "jit__pe_batch_fused_wire-k-cache").write_bytes(b"x")
    _set_cache_dir(request, tmp_cache)
    ids, refs, batch, k = _workload(512, n_nodes=4)
    from vstrains_tpu.ops.pe_infer import build_kmer_table
    import jax.numpy as jnp
    tbl = build_kmer_table(refs, k + 1)
    empty = jnp.zeros(0, jnp.int32)
    tab = (jnp.asarray(tbl.h1_biased), empty, empty,
           jnp.asarray(tbl.seq_lens))
    import logging
    return pe_infer._CompileRace(
        jax.devices("cpu")[0], tbl, tab, empty,
        dict(stats_impl="scatter", probe="sort"), k + 1, 512, 4,
        logging.getLogger("race_test"))


def test_warm_grace_extends_on_plausible_cache_hit(tmp_path, request,
                                                   monkeypatch):
    """With a fused-kernel executable in the cache dir the CPU grace is
    the warm default (90s); without one it stays 2s; explicit
    VSTRAINS_RACE_GRACE always wins."""
    monkeypatch.delenv("VSTRAINS_RACE_GRACE", raising=False)
    race = _make_race(request, tmp_path, with_kernel_file=True)
    assert race._grace == 90.0
    for f in tmp_path.iterdir():
        f.unlink()
    race = _make_race(request, tmp_path, with_kernel_file=False)
    assert race._grace == 2.0
    monkeypatch.setenv("VSTRAINS_RACE_GRACE", "7.5")
    race = _make_race(request, tmp_path, with_kernel_file=True)
    assert race._grace == 7.5


def test_race_cpu_state_is_lazy(tmp_path, request):
    """Construction must NOT build CPU-device table copies (the eager
    D2H pull wedged the driver when the relay hung); they appear only
    once the CPU side actually runs, and finish() tolerates a run where
    no CPU batch ever happened."""
    race = _make_race(request, tmp_path, with_kernel_file=False)
    assert not hasattr(race, "_tab")
    assert not race._cpu_state_ready.is_set()
    nm, sm = race.finish()   # no CPU work: zero matrices, no crash
    assert nm.sum() == 0 and sm.sum() == 0
    race._ensure_cpu_state()
    assert race._cpu_state_ready.is_set()
    assert len(race._tab) == 4


def test_warm_timeout_overrides_grace(tmp_path, request, monkeypatch):
    """VSTRAINS_WARM_TIMEOUT caps how long enqueue waits before starting
    the CPU warm, even under the 90s warm grace — the wedged-tunnel
    fallback."""
    monkeypatch.delenv("VSTRAINS_RACE_GRACE", raising=False)
    monkeypatch.setenv("VSTRAINS_WARM_TIMEOUT", "0")
    race = _make_race(request, tmp_path, with_kernel_file=True)
    assert race._grace == 90.0 and race._warm_timeout == 0.0
    # a blocked accel warm: event registered but never set
    race._events[128] = race._threading.Event()
    race._warm_started[128] = race._time.monotonic()
    import numpy as _np
    wire = _np.zeros((512, pe_infer._wire_width(128)), _np.uint8)
    race.enqueue("wire", wire, 128)
    assert 128 in race._cpu_events, (
        "warm timeout did not trigger the CPU warm under the long grace")

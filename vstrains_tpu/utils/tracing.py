"""Stage timing + device profiling.

The reference's observability is two wall-clock prints
(/root/reference/vstrains:226-252, VStrains_PE_Inference.py:98-210). Here
every pipeline stage runs under a StageTimer that records wall time and
optional jax.profiler traces, and the summary is dumped as JSON for
regression tracking.
"""

from __future__ import annotations

import contextlib
import json
import logging
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

_LOG = logging.getLogger(__name__)


@dataclass
class StageTimer:
    """Accumulates named stage durations; optionally wraps stages in
    jax.profiler.TraceAnnotation and can dump a full device trace."""
    profile_dir: Optional[str] = None
    stages: List[dict] = field(default_factory=list)
    _trace_active: bool = False

    @contextlib.contextmanager
    def stage(self, name: str, logger: logging.Logger = None):
        logger = logger or _LOG
        t0 = time.time()
        ctx = contextlib.nullcontext()
        try:
            import jax.profiler
            ctx = jax.profiler.TraceAnnotation(name)
        except Exception:
            pass
        with ctx:
            yield
        dt = time.time() - t0
        self.stages.append({"stage": name, "seconds": round(dt, 4)})
        logger.info("[timing] %s: %.2fs", name, dt)

    @contextlib.contextmanager
    def device_trace(self):
        """Full profiler trace (view with tensorboard/xprof)."""
        if not self.profile_dir:
            yield
            return
        import jax.profiler
        jax.profiler.start_trace(self.profile_dir)
        try:
            yield
        finally:
            jax.profiler.stop_trace()

    def summary(self) -> Dict:
        total = sum(s["seconds"] for s in self.stages)
        return {"total_seconds": round(total, 4), "stages": self.stages}

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)

"""XLA recompile accounting via jax_log_compiles.

The training loop's budget autotune + capacity growth trade recompiles for
static shapes (the TPU answer to the reference's resizeFunctional arena,
rasterize_points.cu:27-33); long runs must show the count stays O(log
growth). This handler counts actual 'Finished XLA compilation' events and
their wall time, per jitted-function name."""

from __future__ import annotations

import logging
import re


class CompileCounter(logging.Handler):
    PAT = re.compile(r"Finished XLA compilation of (.+) in ([0-9.]+) sec")

    def __init__(self):
        super().__init__(level=logging.WARNING)
        self.by_name: dict[str, int] = {}
        self.total_s = 0.0

    def emit(self, record):
        m = self.PAT.search(record.getMessage())
        if m:
            self.by_name[m.group(1)] = self.by_name.get(m.group(1), 0) + 1
            self.total_s += float(m.group(2))

    def count(self, substr: str) -> int:
        return sum(v for k, v in self.by_name.items() if substr in k)

    @property
    def total(self) -> int:
        return sum(self.by_name.values())

    def install(self):
        """Enable jax compile logging, attach, and silence the stderr spam."""
        import jax

        jax.config.update("jax_log_compiles", True)
        for name in ("jax._src.dispatch", "jax._src.interpreters.pxla"):
            lg = logging.getLogger(name)
            lg.addHandler(self)
            lg.setLevel(logging.WARNING)
            lg.propagate = False
        return self

"""Standalone option surface for module-level smoke runs.

Reference models/config_test.py:4-76 is a near-duplicate of the main
``BaseOptions`` used by ``__main__`` blocks, with different defaults
(``vit_heads=4``, no ``pl_reg``).  Here it reuses the single Options
dataclass with those defaults applied.
"""

from __future__ import annotations

import dataclasses

from scat_tpu.config import BaseOptions as _BaseOptions, Options


class BaseOptions(_BaseOptions):
    """Smoke-run options (reference config_test.py defaults)."""

    def parse(self, argv=None) -> Options:
        import sys
        opt = super().parse(argv)
        raw = sys.argv[1:] if argv is None else argv
        given = any(a.split("=")[0] == "--vit_heads" for a in raw)
        if not given:
            opt = dataclasses.replace(opt, vit_heads=4)
        return opt

"""Standalone option surface for module-level smoke runs.

Reference models/config_test.py:4-76 is a near-duplicate of the main
``BaseOptions`` used by ``__main__`` blocks, with different defaults
(``vit_heads=4`` at :21, ``pos_embed=False`` at :50; no ``pl_reg``).
Here it reuses the single Options dataclass with those defaults
applied — pinned against the literal twin in
tests/test_literal_config.py.
"""

from __future__ import annotations

import dataclasses

from scat_tpu.config import BaseOptions as _BaseOptions, Options

_TWIN_DEFAULTS = {"vit_heads": 4, "pos_embed": False}


class BaseOptions(_BaseOptions):
    """Smoke-run options (reference config_test.py defaults)."""

    def parse(self, argv=None) -> Options:
        import sys
        opt = super().parse(argv)
        raw = sys.argv[1:] if argv is None else argv
        for flag, default in _TWIN_DEFAULTS.items():
            given = any(a.split("=")[0] == f"--{flag}" for a in raw)
            if not given:
                opt = dataclasses.replace(opt, **{flag: default})
        return opt

"""Literal config oracles: every flag and default of the reference's
two argparse surfaces (config.py:4-78 and its models/config_test.py
twin) against our Options dataclass — flag-for-flag, default-for-
default.  Parsing semantics (including the ``type=bool`` truthiness
bug behind ``compat_argparse_bool``) are covered by test_cli /
config tests; this pins the SURFACE itself to upstream.
"""

import dataclasses

import pytest

import literal_ref


def test_literal_config_defaults():
    cfg = literal_ref.load("config")
    literal = vars(cfg.BaseOptions().parser.parse_args([]))
    from scat_tpu.config import Options
    ours = dataclasses.asdict(Options())
    missing = [k for k in literal if k not in ours]
    assert not missing, missing
    diffs = {k: (literal[k], ours[k]) for k in literal
             if ours[k] != literal[k]}
    assert not diffs, diffs
    assert len(literal) >= 36  # the full reference flag surface


def test_literal_config_test_twin_defaults():
    ct = literal_ref.load("models.config_test")
    literal = vars(ct.BaseOptions().parser.parse_args([]))
    from scat_tpu.models.config_test import BaseOptions
    ours = dataclasses.asdict(BaseOptions().parse([]))
    missing = [k for k in literal if k not in ours]
    assert not missing, missing
    diffs = {k: (literal[k], ours[k]) for k in literal
             if ours[k] != literal[k]}
    assert not diffs, diffs
    # the twin's documented divergences from the main surface
    assert literal["vit_heads"] == 4
    assert literal["pos_embed"] is False


def test_literal_config_bool_flag_quirk():
    """config.py uses ``type=bool`` so ``--pl_reg False`` parses as
    True (bool('False') is truthy) — the quirk our
    ``compat_argparse_bool`` preserves-or-fixes.  Witness it on the
    literal parser so the compat flag's premise stays checked."""
    cfg = literal_ref.load("config")
    opt = cfg.BaseOptions().parser.parse_args(["--pl_reg", "False"])
    assert opt.pl_reg is True  # the shipped bug, literally

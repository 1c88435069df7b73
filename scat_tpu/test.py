"""CLI entry: ``python -m scat_tpu.test`` — the FrankMocap/MANO
inference flow over a folder of RGB crops (reference test.py:444-446)."""

from scat_tpu.evaluation.tester import main

if __name__ == "__main__":
    main()

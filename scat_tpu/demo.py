"""CLI entry: ``python -m scat_tpu.demo`` — the temporal/video demo flow
(the reference's shipped ``eval.py __main__`` runs THIS, not the
benchmark eval: eval.py:1073-1076)."""

from scat_tpu.evaluation.demo import main

if __name__ == "__main__":
    main()

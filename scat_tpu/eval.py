"""CLI entry: ``python -m scat_tpu.eval`` (reference eval.py:1056-1062).

``--eval_dataset STB|frei|ho3d --checkpoint_path_eval ... --result_dir ...``
"""

from scat_tpu.evaluation.evaluator import main

if __name__ == "__main__":
    main()

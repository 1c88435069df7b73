"""CLI entry: ``python -m scat_tpu.eval`` — the benchmark evaluation
(reference eval.py:1056-1062 ``main()``).

``--eval_dataset STB|frei|ho3d --checkpoint_path_eval ... --result_dir ...``

Note: the reference's shipped ``__main__`` actually calls ``demo()``
(eval.py:1073-1076, main()/test() commented out); that flow is
``python -m scat_tpu.demo`` here, and the FrankMocap inference flow is
``python -m scat_tpu.test``.
"""

from scat_tpu.evaluation.evaluator import main

if __name__ == "__main__":
    main()

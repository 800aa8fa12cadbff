from univtg_tpu.evals.submission import eval_submission  # noqa: F401

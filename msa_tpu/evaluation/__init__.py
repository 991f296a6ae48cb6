from msa_tpu.evaluation.evaluator import ModelEvaluator  # noqa: F401

from detectax.eval.detection_metrics import MeanAPEvaluator  # noqa: F401

from demovlp_tpu.metrics.retrieval import t2v_metrics, v2t_metrics, cols2metrics
from demovlp_tpu.metrics.qa import evaluate_qa, evaluate_mc

__all__ = ["t2v_metrics", "v2t_metrics", "cols2metrics", "evaluate_qa", "evaluate_mc"]

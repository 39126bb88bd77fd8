from digat_tpu.ops.segment import segment_softmax_sum
from digat_tpu.ops.gat import interactive_gat_scores, vanilla_gat_scores

__all__ = ["segment_softmax_sum", "interactive_gat_scores", "vanilla_gat_scores"]

from ultrazoom_tpu.export import hf
from ultrazoom_tpu.export.hf import load_pretrained, save_pretrained, tree_to_torch_flat

__all__ = ["hf", "load_pretrained", "save_pretrained", "tree_to_torch_flat"]

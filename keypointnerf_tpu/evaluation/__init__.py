from .metrics import bounding_rect, psnr, structural_similarity
from .evaluator import Evaluator, eval_saved_images

__all__ = ["bounding_rect", "psnr", "structural_similarity", "Evaluator", "eval_saved_images"]
from .run_eval import run_eval

__all__.append("run_eval")
from .meshing import extract_mesh, marching_tetrahedra, save_obj

__all__ += ["extract_mesh", "marching_tetrahedra", "save_obj"]

# UniDet baseline: joint
# TriSource training with a unified dataset view, source_ratio [1,1,1],
# plain step LR, NO MoE (parity: local_configs/main_unidet_convnext_t_orcnn_gfl.py)
_base_ = ["main_convnext_t_orcnn_gfl_simple_joint.py"]
source_ratio = [1, 1, 1]
work_dir = "./work_dirs/main_unidet"

# MoE experts/top-k ablation: E=8, k=2 (last-2-block placement)
# (parity: local_configs/ablation_moe_et_convnext_t_orcnn_gfl_e8t2_last2blocks.py)
_base_ = ["../sm3det_convnext_t.py"]
model = dict(backbone=dict(
    moe_block_inds=[[], [], [0, 2, 4, 6, 8], [0, 2]],
    num_experts=8, top_k=2))
work_dir = "./work_dirs/ablation_moe_et_convnext_t_orcnn_gfl_e8t2_last2blocks"

# MoE block-placement ablation: evenblocks (e8t2)
# (parity: local_configs/ablation_moe_blk_convnext_t_orcnn_gfl_e8t2_evenblocks.py)
_base_ = ["../sm3det_convnext_t.py"]
model = dict(backbone=dict(moe_block_inds=[[0, 2], [0, 2], [0, 2, 4, 6, 8], [0, 2]],
                           num_experts=8, top_k=2))
work_dir = "./work_dirs/ablation_moe_blk_convnext_t_orcnn_gfl_e8t2_evenblocks"

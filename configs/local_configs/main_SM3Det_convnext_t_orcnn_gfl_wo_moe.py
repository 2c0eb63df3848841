# SM3Det lightweight: DLA only, no MoE
# (parity: local_configs/main_SM3Det_convnext_t_orcnn_gfl_wo_moe.py)
_base_ = ["../sm3det_convnext_t.py"]
model = dict(backbone=dict(moe_block_inds=[[], [], [], []]))
work_dir = "./work_dirs/sm3det_wo_moe"

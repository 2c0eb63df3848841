# Simple Joint Training: no MoE, no DLA
# (parity: local_configs/main_convnext_t_orcnn_gfl_simple_joint.py)
_base_ = ["../sm3det_convnext_t.py"]
model = dict(backbone=dict(moe_block_inds=[[], [], [], []]))
lr_config = dict(policy="step", warmup="linear", warmup_iters=500,
                 warmup_ratio=1.0 / 3, _delete_=True,
                 step=[62196, 85520])
work_dir = "./work_dirs/simple_joint"

# SAR specialist: convnext-s + GFL
# (parity: local_configs/sardet50k_convnext_s_gfl.py)
_base_ = ["sardet50k_convnext_t_gfl.py"]
model = dict(
    backbone=dict(arch="small",
                  moe_block_inds=[[], [], [], []]),
    neck=dict(in_channels=[96, 192, 384, 768]))
work_dir = "./work_dirs/sardet50k_convnext_s_gfl"

# SAR specialist: convnext-b + GFL
# (parity: local_configs/sardet50k_convnext_b_gfl.py)
_base_ = ["sardet50k_convnext_t_gfl.py"]
model = dict(
    backbone=dict(arch="base",
                  moe_block_inds=[[], [], [], []]),
    neck=dict(in_channels=[128, 256, 512, 1024]))
work_dir = "./work_dirs/sardet50k_convnext_b_gfl"

# DOTA specialist: convnext-b + Oriented R-CNN
# (parity: local_configs/dota_convnext_b_orcnn.py)
_base_ = ["dota_convnext_t_orcnn.py"]
model = dict(
    backbone=dict(arch="base",
                  moe_block_inds=[[], [], [], []]),
    neck=dict(in_channels=[128, 256, 512, 1024]))
work_dir = "./work_dirs/dota_convnext_b_orcnn"

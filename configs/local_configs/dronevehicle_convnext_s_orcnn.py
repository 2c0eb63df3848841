# DRONEVEHICLE specialist: convnext-s + Oriented R-CNN
# (parity: local_configs/dronevehicle_convnext_s_orcnn.py)
_base_ = ["dronevehicle_convnext_t_orcnn.py"]
model = dict(
    backbone=dict(arch="small",
                  moe_block_inds=[[], [], [], []]),
    neck=dict(in_channels=[96, 192, 384, 768]))
work_dir = "./work_dirs/dronevehicle_convnext_s_orcnn"

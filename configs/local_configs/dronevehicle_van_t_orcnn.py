# DRONEVEHICLE specialist: van-t + Oriented R-CNN
# (parity: local_configs/dronevehicle_van_t_orcnn.py)
_base_ = ["dronevehicle_convnext_t_orcnn.py"]
model = dict(
    backbone=dict(_delete_=True, type="VAN_moe",
                  embed_dims=[32, 64, 160, 256], depths=[3, 3, 5, 2],
                  moe_block_inds_fc1=[[], [], [], []]),
    neck=dict(in_channels=[32, 64, 160, 256]))
work_dir = "./work_dirs/dronevehicle_van_t_orcnn"

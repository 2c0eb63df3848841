# SAR specialist: van-t + GFL
# (parity: local_configs/sardet50k_van_t_gfl.py)
_base_ = ["sardet50k_convnext_t_gfl.py"]
model = dict(
    backbone=dict(_delete_=True, type="VAN_moe",
                  embed_dims=[32, 64, 160, 256], depths=[3, 3, 5, 2],
                  moe_block_inds_fc1=[[], [], [], []]),
    neck=dict(in_channels=[32, 64, 160, 256]))
work_dir = "./work_dirs/sardet50k_van_t_gfl"

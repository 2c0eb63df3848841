# DRONEVEHICLE specialist: lsk-s + Oriented R-CNN
# (parity: local_configs/dronevehicle_lsk_s_orcnn.py)
_base_ = ["dronevehicle_convnext_t_orcnn.py"]
model = dict(
    backbone=dict(_delete_=True, type="LSKNet_moe",
                  embed_dims=[64, 128, 320, 512], depths=[2, 2, 4, 2],
                  moe_block_inds_fc1=[[], [], [], []]),
    neck=dict(in_channels=[64, 128, 320, 512]))
work_dir = "./work_dirs/dronevehicle_lsk_s_orcnn"

# DOTA specialist: lsk-b + Oriented R-CNN
# (parity: local_configs/dota_lsk_b_orcnn.py)
_base_ = ["dota_convnext_t_orcnn.py"]
model = dict(
    backbone=dict(_delete_=True, type="LSKNet_moe",
                  embed_dims=[64, 128, 320, 512], depths=[3, 3, 12, 3],
                  moe_block_inds_fc1=[[], [], [], []]),
    neck=dict(in_channels=[64, 128, 320, 512]))
work_dir = "./work_dirs/dota_lsk_b_orcnn"

# SAR specialist: lsk-b + GFL
# (parity: local_configs/sardet50k_lsk_b_gfl.py)
_base_ = ["sardet50k_convnext_t_gfl.py"]
model = dict(
    backbone=dict(_delete_=True, type="LSKNet_moe",
                  embed_dims=[64, 128, 320, 512], depths=[3, 3, 12, 3],
                  moe_block_inds_fc1=[[], [], [], []]),
    neck=dict(in_channels=[64, 128, 320, 512]))
work_dir = "./work_dirs/sardet50k_lsk_b_gfl"

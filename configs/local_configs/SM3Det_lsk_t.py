# SM3Det flagship with lsk-t backbone (e8k3 + DLA)
# (parity: local_configs/SM3Det_lsk_t.py)
_base_ = ["../sm3det_convnext_t.py"]
model = dict(
    backbone=dict(_delete_=True, type="LSKNet_moe_MultiInput",
                  embed_dims=[32, 64, 160, 256], depths=[3, 3, 5, 2],
                  moe_block_inds_fc1=[[], [], [0, 2, 4], [0]],
                  num_experts=8, top_k=3, gate="cosine"),
    neck=dict(in_channels=[32, 64, 160, 256]))
work_dir = "./work_dirs/SM3Det_lsk_t"

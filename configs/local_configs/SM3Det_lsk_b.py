# SM3Det flagship with lsk-b backbone (e8k3 + DLA)
# (parity: local_configs/SM3Det_lsk_b.py)
_base_ = ["../sm3det_convnext_t.py"]
model = dict(
    backbone=dict(_delete_=True, type="LSKNet_moe_MultiInput",
                  embed_dims=[64, 128, 320, 512], depths=[3, 3, 12, 3],
                  moe_block_inds_fc1=[[], [], [0, 2, 4], [0]],
                  num_experts=8, top_k=3, gate="cosine"),
    neck=dict(in_channels=[64, 128, 320, 512]))
work_dir = "./work_dirs/SM3Det_lsk_b"

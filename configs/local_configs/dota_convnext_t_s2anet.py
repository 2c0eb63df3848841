# DOTA specialist: ConvNeXt-T + S2ANet
# (parity: local_configs/dota_convnext_t_s2anet.py)
_base_ = ["dota_convnext_t_orcnn.py"]
model = dict(type="S2ANet")
work_dir = "./work_dirs/dota_convnext_t_s2anet"

# DRONEVEHICLE specialist: ConvNeXt-T + S2ANet
# (parity: local_configs/dronevehicle_convnext_t_s2anet.py)
_base_ = ["dronevehicle_convnext_t_orcnn.py"]
model = dict(type="S2ANet")
work_dir = "./work_dirs/dronevehicle_convnext_t_s2anet"

# DRONEVEHICLE specialist: ConvNeXt-T + RoITransformer
# (parity: local_configs/dronevehicle_convnext_t_roitrans.py)
_base_ = ["dronevehicle_convnext_t_orcnn.py"]
model = dict(type="RoITransformer")
work_dir = "./work_dirs/dronevehicle_convnext_t_roitrans"

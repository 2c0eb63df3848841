# DOTA specialist: ConvNeXt-T + RoITransformer
# (parity: local_configs/dota_convnext_t_roitrans.py)
_base_ = ["dota_convnext_t_orcnn.py"]
model = dict(type="RoITransformer")
work_dir = "./work_dirs/dota_convnext_t_roitrans"

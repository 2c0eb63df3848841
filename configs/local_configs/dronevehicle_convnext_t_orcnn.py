# DroneVehicle specialist (parity: local_configs/dronevehicle_...py)
_base_ = ["dota_convnext_t_orcnn.py"]
work_dir = "./work_dirs/dronevehicle_orcnn"

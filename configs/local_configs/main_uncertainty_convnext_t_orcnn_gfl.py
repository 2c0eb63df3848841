# Uncertainty multi-task reweighting baseline
# (parity: local_configs/main_uncertainty_convnext_t_orcnn_gfl.py)
_base_ = ["../sm3det_convnext_t.py"]
model = dict(backbone=dict(moe_block_inds=[[], [], [], []]),
             multi_tasks_reweight="uncertainty")
lr_config = dict(policy="step", warmup="linear", warmup_iters=500,
                 warmup_ratio=1.0 / 3, _delete_=True,
                 step=[62196, 85520])
work_dir = "./work_dirs/uncertainty"

# SOI-Det benchmark: SARDet-50K (SAR, HBB) + DOTA-800 (RGB, OBB)
# + DroneVehicle (IR, OBB). Parity with configs/_base_/datasets/SOI_Det.py.
# When data roots are absent, tools fall back to synthetic fixtures.
angle_version = "le90"
num_classes = 26
source_ratio = [2, 1, 1]
img_size = 800

data = dict(
    sar=dict(type="CocoDetDataset",
             ann_file="data/SARDet_50K/Annotations/train.json",
             img_folder="data/SARDet_50K/JPEGImages",
             max_gt=100),
    rgb=dict(type="DOTADataset",
             ann_folder="data/split_ss_dota/trainval/annfiles",
             img_folder="data/split_ss_dota/trainval/images",
             max_gt=512),
    ifr=dict(type="DOTADataset",
             ann_folder="data/dronevehicle/train/annfiles",
             img_folder="data/dronevehicle/train/images",
             max_gt=256),
    val=dict(
        sar=dict(type="CocoDetDataset",
                 ann_file="data/SARDet_50K/Annotations/val.json",
                 img_folder="data/SARDet_50K/JPEGImages"),
        rgb=dict(type="DOTADataset",
                 ann_folder="data/split_ss_dota/val/annfiles",
                 img_folder="data/split_ss_dota/val/images"),
        ifr=dict(type="DOTADataset",
                 ann_folder="data/dronevehicle/val/annfiles",
                 img_folder="data/dronevehicle/val/images"),
    ),
)

# SOI-Det benchmark: SARDet-50K (SAR, HBB) + DOTA-800 (RGB, OBB)
# + DroneVehicle (IR, OBB). Parity with configs/_base_/datasets/SOI_Det.py.
# When data roots are absent, tools fall back to synthetic fixtures.
angle_version = "le90"
num_classes = 26
source_ratio = [2, 1, 1]
img_size = 800

# Train-time augmentation flags per modality (reference pipelines,
# configs/_base_/datasets/SOI_Det.py:20-80): SAR flips horizontally at
# 0.5; RGB/IFR use 3-direction flip [h, v, diagonal] at 0.25 each plus
# PolyRandomRotate(rotate_ratio=0.5, angles_range=180) with the
# rectangle classes snapped to 90-degree multiples.
_obb_train_pipeline = dict(
    flip_ratio=[0.25, 0.25, 0.25],
    flip_directions=["horizontal", "vertical", "diagonal"],
    rotate_ratio=0.5,
    angles_range=180,
    rect_classes=[0, 1, 2, 3, 4, 5, 16, 18],
)

data = dict(
    sar=dict(type="CocoDetDataset",
             ann_file="data/SARDet_50K/Annotations/train.json",
             img_folder="data/SARDet_50K/JPEGImages",
             max_gt=100,
             pipeline=dict(flip_ratio=0.5,
                           flip_directions=["horizontal"])),
    rgb=dict(type="DOTADataset",
             ann_folder="data/split_ss_dota/trainval/annfiles",
             img_folder="data/split_ss_dota/trainval/images",
             max_gt=512,
             pipeline=_obb_train_pipeline),
    ifr=dict(type="DOTADataset",
             ann_folder="data/dronevehicle/train/annfiles",
             img_folder="data/dronevehicle/train/images",
             max_gt=256,
             pipeline=_obb_train_pipeline),
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

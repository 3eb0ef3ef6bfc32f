"""Data layer: readers, augmentation, dataset classes, prefetching loader.

Registry (reference parity: /root/reference/datasets/__init__.py:13-19):
__datasets__ = {sceneflow, kitti, us3d, cityscapes, WhuDataset, whu}.
"""

from semstereo_tpu.data.datasets import (
    CityscapesDataset,
    KittiDataset,
    SceneFlowDataset,
    StereoDataset,
    Us3dDataset,
    WhuDataset,
    __datasets__,
)
from semstereo_tpu.data.loader import DataLoader, SyntheticStereoDataset, collate

__all__ = [
    "CityscapesDataset",
    "KittiDataset",
    "SceneFlowDataset",
    "StereoDataset",
    "Us3dDataset",
    "WhuDataset",
    "__datasets__",
    "DataLoader",
    "SyntheticStereoDataset",
    "collate",
]

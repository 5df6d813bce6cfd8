from tpusr.data.div2k import DatasetConfig, DIV2KDataset, GANDIV2KDataset, get_image_pair

__all__ = ["DatasetConfig", "DIV2KDataset", "GANDIV2KDataset", "get_image_pair"]

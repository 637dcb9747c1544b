from srvp_tpu.data.base import load_dataset, collate, VideoDataset  # noqa: F401
from srvp_tpu.data.loader import DataLoader  # noqa: F401

from egorear_tpu.data.datasets import get_dataset
from egorear_tpu.data.loader import DataLoader

from pixelpick_tpu.data.factory import get_dataset
from pixelpick_tpu.data.loader import Loader

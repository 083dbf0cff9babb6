from pixelpick_tpu.utils.metrics import AverageMeter, RunningScore, confusion_matrix
from pixelpick_tpu.utils.logging import write_log

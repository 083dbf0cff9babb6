from pixelpick_tpu.models.factory import get_model, init_model

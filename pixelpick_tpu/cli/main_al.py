"""Full active-learning loop with the GT oracle — reference ``main_al.py``.

Usage (the reference's canonical CamVid benchmark, scripts/pixelpick-dl-cv.sh):
    python main_al.py --dataset_name cv --n_pixels_by_us 10 -qs margin_sampling
"""

from pixelpick_tpu.config import Arguments
from pixelpick_tpu.active.driver import ALModel


def main():
    args = Arguments().parse_args()
    model = ALModel(args)
    try:
        model()
    finally:
        model.close()


if __name__ == "__main__":
    main()

"""Worker process for tests/test_multihost.py::test_two_process_al_driver —
NOT a pytest file. Runs the FULL AL driver (train rounds + validation +
pool sweep + oracle labelling + artifacts) as one of two jax.distributed
processes sharing a global 8-device ('data',) mesh and one checkpoint dir.
"""

import os
import sys


def main():
    pid, port, root = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    extra = sys.argv[4:]  # e.g. "device_augment"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")

    from pixelpick_tpu.config import default_args

    args = default_args(
        write_files=True,
        p_dataset_config=f"{root}/custom.yaml",
        dir_root=root,
        n_pixels_by_us=3, max_budget=6, top_n_percent=0.0,
        query_strategy="margin_sampling", n_workers=1,
        dist_coordinator=f"localhost:{port}",
        dist_num_processes=2, dist_process_id=pid,
        **{k: True for k in extra},
    )
    assert jax.process_count() == 2 and jax.device_count() == 8

    from pixelpick_tpu.active.driver import ALModel

    model = ALModel(args)
    model()
    model.close()
    print(f"RESULT {pid} n_pixels={model.dataset.n_pixels_total} "
          f"best_miou={model.best_miou:.6f} "
          f"ckpt={args.dir_checkpoints}", flush=True)


if __name__ == "__main__":
    main()

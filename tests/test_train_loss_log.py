"""``log_train.txt``'s loss column is the EPOCH MEAN of the per-step losses
— the reference accumulates ``running_loss`` per iteration and logs its
``.avg`` (``model.py:126,147``); the driver keeps the per-step device
scalars unsynced until epoch end and drains them once
(``active/driver.py:_train_epoch``).

The train step is faked (deterministic losses, no compute) so the test
isolates the logging semantics from the numerics.
"""

import jax.numpy as jnp

from tests.helpers import synthetic_args


def test_logged_loss_is_mean_of_per_step_losses(tmp_path, monkeypatch):
    import pixelpick_tpu.active.driver as drv

    recorded = []

    def fake_make_train_step(model, tx, *, n_classes, **kw):
        def step(state, batch, rng):
            loss = jnp.asarray(1.0 + 2.0 * len(recorded))  # 1.0, 3.0, ...
            recorded.append(float(loss))
            hist = jnp.zeros((n_classes, n_classes), jnp.int32)
            return state, loss, hist
        return step

    monkeypatch.setattr(drv, "make_train_step", fake_make_train_step)
    args = synthetic_args(tmp_path, n_pixels_by_us=5, max_budget=5,
                          n_epochs=1, batch_size=4)
    model = drv.ALModel(args)
    model.dataset.crop_size = (48, 64)
    monkeypatch.setattr(model, "_val", lambda *a, **k: None)
    monkeypatch.setattr(model, "_visualise", lambda *a, **k: None)
    try:
        model._run_stage("0_query")
    finally:
        model.close()

    # 8 synthetic train images, batch 4 -> exactly 2 steps in the epoch
    assert recorded == [1.0, 3.0]
    with open(f"{args.dir_checkpoints}/0_query/log_train.txt") as f:
        rows = f.read().strip().splitlines()
    assert rows[0] == "epoch,mIoU,pixel_acc,loss"
    logged_loss = float(rows[1].split(",")[-1])
    assert logged_loss == sum(recorded) / len(recorded) == 2.0

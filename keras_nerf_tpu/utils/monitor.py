"""Training monitor: CSV logging, PNG render panels, periodic checkpoints,
epoch-level resume.

Rebuild of the reference ``NeRFTrainMonitor``
(`keras_nerf/model/nerf/callback.py:8-226`) against the JAX NeRF model:

* ``log.csv`` schema-compatible rows (``epoch`` + the six train metrics +
  ``val_``-prefixed six) appended every ``update_freq`` epochs, header written
  once at epoch 0 (`callback.py:211-218`);
* resume: parse an existing ``log.csv`` to rebuild loss histories and
  ``last_epoch`` (`callback.py:33-47`). Deviation: the reference skips its
  first data row (``if i > 0``, `callback.py:38-39`) — a bug that truncates
  the restored history; all rows are read here;
* every ``update_freq`` epochs: a 2x5 panel (coarse/fine image+depth, ground
  truth, log-scale loss curves) per image of a FIXED batch as
  ``test_{i}_{epoch}.png``, and a 1x5 panel of a FRESH batch as
  ``test_sample_{i}_{epoch}.png`` (`callback.py:126-209`);
* checkpoint to ``{log_dir}/model`` (full config at epoch 0, weights-only
  after — `callback.py:220-222`);
* verbose mode: per-batch ``debug_{i}_{batch}.png`` renders
  (`callback.py:62-111`).
"""

from __future__ import annotations

import logging
import os
from csv import DictReader, DictWriter

import matplotlib
import numpy as np

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


class NeRFTrainMonitor:
    """Keras-style callback consumed by ``NeRF.fit`` (`callback.py:8`)."""

    def __init__(self, dataset, log_dir: str, batch_size: int,
                 update_freq: int = 1, verbose: bool = False, **_):
        logging.info("Initializing NeRFTrainMonitor: log_dir=%s "
                     "batch_size=%d update_freq=%d",
                     log_dir, batch_size, update_freq)
        self.dataset = dataset
        self.log_dir = log_dir
        self.batch_size = batch_size
        self.update_freq = update_freq
        self.verbose = verbose
        self.model = None

        self.log_model_dir = os.path.join(log_dir, "model")
        os.makedirs(self.log_model_dir, exist_ok=True)

        self.coarse_log_list: list[float] = []
        self.val_coarse_log_list: list[float] = []
        self.fine_log_list: list[float] = []
        self.val_fine_log_list: list[float] = []
        if self.verbose:
            self.coarse_log_list_batch: list[float] = []
            self.fine_log_list_batch: list[float] = []

        # Resume from an existing log.csv (`callback.py:33-47`).
        self.last_epoch = 0
        self.log_csv = os.path.join(log_dir, "log.csv")
        if os.path.exists(self.log_csv):
            with open(self.log_csv) as f:
                for row in DictReader(f):
                    self.coarse_log_list.append(float(row["coarse_loss"]))
                    self.val_coarse_log_list.append(
                        float(row["val_coarse_loss"]))
                    self.fine_log_list.append(float(row["fine_loss"]))
                    self.val_fine_log_list.append(float(row["val_fine_loss"]))
                    self.last_epoch = int(row["epoch"])
            if self.coarse_log_list:
                self.last_epoch += 1
            logging.info("Resuming monitor at epoch %d", self.last_epoch)

        os.makedirs(self.log_dir, exist_ok=True)

        # A fixed batch for the stable visualization panels
        # (`callback.py:53-57`) and a separate iterator for fresh samples.
        # Splits smaller than the (global) batch size would yield zero
        # batches under drop_remainder — rebatch the view down so the
        # monitor always has something to render.
        if hasattr(self.dataset, "num_examples") and \
                hasattr(self.dataset, "rebatch") and \
                self.dataset.num_examples < batch_size:
            logging.warning(
                "monitor dataset has %d images < batch_size %d; rebatching",
                self.dataset.num_examples, batch_size)
            self.dataset = self.dataset.rebatch(self.dataset.num_examples)
            self.batch_size = self.dataset.num_examples
            batch_size = self.batch_size
            # A rebatched size that no longer divides the mesh cannot carry
            # the per-device batch sharding (panel renders shard by image
            # height instead, so any batch size works downstream).
            sharding = getattr(self.dataset, "sharding", None)
            if (sharding is not None and
                    batch_size % sharding.mesh.devices.size != 0):
                self.dataset.sharding = None
        batches = self.dataset.take(1)
        if not batches:
            raise ValueError("monitor dataset yielded no batches")
        self.images, self.rays = batches[0]
        self.images = np.asarray(self.images)[:batch_size]
        self.rays = tuple(
            np.asarray(r)[:batch_size] for r in self.rays)
        self._fresh_iter = iter(self.dataset)
        next(self._fresh_iter, None)

    def set_model(self, model):
        self.model = model

    # ---------------------------------------------------------------- panels

    def _panel_row(self, fig, gs, row, coarse, fine, gt, i):
        titles = ["Coarse Image", "Coarse Depth", "Fine Image", "Fine Depth",
                  "Ground Truth"]
        arrays = [
            np.asarray(coarse["image"][i]),
            np.asarray(coarse["depth"][i]),
            np.asarray(fine["image"][i]),
            np.asarray(fine["depth"][i]),
            gt[i],
        ]
        for col, (title, arr) in enumerate(zip(titles, arrays)):
            ax = fig.add_subplot(gs[row, col])
            if arr.ndim == 2:
                ax.imshow(arr, cmap="inferno")
            else:
                ax.imshow(np.clip(arr, 0, 1))
            ax.set_title(title)
            ax.axis("off")

    def _batch_loss_axes(self, fig, gs, batch):
        """Log-scale per-batch loss curves (`callback.py:100-107`)."""
        ax = fig.add_subplot(gs[1, :])
        ax.plot(self.coarse_log_list_batch, color="blue",
                label="Coarse Train Loss")
        ax.plot(self.fine_log_list_batch, color="orange",
                label="Fine Train Loss")
        ax.legend()
        ax.set_yscale("log")
        ax.set_title(f"Loss Batch Plot: {batch}")

    def _loss_axes(self, fig, gs, epoch):
        ax = fig.add_subplot(gs[1, :])
        ax.plot(self.coarse_log_list, color="blue", label="Coarse Train Loss")
        ax.plot(self.val_coarse_log_list, color="blue", linestyle="dashed",
                label="Coarse Val Loss")
        ax.plot(self.fine_log_list, color="orange", label="Fine Train Loss")
        ax.plot(self.val_fine_log_list, color="orange", linestyle="dashed",
                label="Fine Val Loss")
        ax.legend()
        ax.set_yscale("log")
        ax.set_title(f"Loss Plot: {epoch}")

    # ------------------------------------------------------------- callbacks

    def on_train_batch_end(self, batch: int, logs: dict):
        if not self.verbose or self.model is None:
            return
        self.coarse_log_list_batch.append(logs["coarse_loss"])
        self.fine_log_list_batch.append(logs["fine_loss"])
        # Every batch image as a 2x5 panel with the log-scale batch-loss
        # curves, exactly the reference's verbose debug renders
        # (`callback.py:75-111`).
        coarse, fine = self.model.predict_and_render_images(self.rays)
        # The captured fixed batch can be smaller than batch_size (e.g. a
        # dataset batched below the monitor's batch_size) — clamp like the
        # fresh-batch loop below.
        for i in range(min(self.batch_size, self.images.shape[0])):
            fig = plt.figure(figsize=(20, 10))
            gs = fig.add_gridspec(2, 5)
            self._panel_row(fig, gs, 0, coarse, fine,
                            self.images[..., :3], i)
            self._batch_loss_axes(fig, gs, batch)
            fig.savefig(os.path.join(self.log_dir, f"debug_{i}_{batch}.png"))
            plt.close(fig)

    def on_epoch_end(self, epoch: int, logs: dict):
        if self.model is None:
            return
        self.coarse_log_list.append(logs["coarse_loss"])
        self.val_coarse_log_list.append(logs["val_coarse_loss"])
        self.fine_log_list.append(logs["fine_loss"])
        self.val_fine_log_list.append(logs["val_fine_loss"])

        if epoch % self.update_freq != 0:
            if self.verbose:
                self.coarse_log_list_batch = []
                self.fine_log_list_batch = []
            return

        # Fixed-batch panels with loss curves (`callback.py:126-166`).
        coarse, fine = self.model.predict_and_render_images(self.rays)
        # The captured fixed batch can be smaller than batch_size (e.g. a
        # dataset batched below the monitor's batch_size) — clamp like the
        # fresh-batch loop below.
        for i in range(min(self.batch_size, self.images.shape[0])):
            fig = plt.figure(figsize=(20, 10))
            gs = fig.add_gridspec(2, 5)
            self._panel_row(fig, gs, 0, coarse, fine,
                            self.images[..., :3], i)
            self._loss_axes(fig, gs, epoch)
            fig.savefig(os.path.join(self.log_dir, f"test_{i}_{epoch}.png"))
            plt.close(fig)

        # Fresh-batch panels (`callback.py:168-209`).
        fresh = next(self._fresh_iter, None)
        if fresh is None:
            self._fresh_iter = iter(self.dataset)
            fresh = next(self._fresh_iter, None)
        if fresh is not None:
            f_images, f_rays = fresh
            f_images = np.asarray(f_images)[:self.batch_size, ..., :3]
            f_rays = tuple(np.asarray(r)[:self.batch_size] for r in f_rays)
            coarse, fine = self.model.predict_and_render_images(f_rays)
            for i in range(min(self.batch_size, f_images.shape[0])):
                fig = plt.figure(figsize=(20, 5))
                gs = fig.add_gridspec(1, 5)
                self._panel_row(fig, gs, 0, coarse, fine, f_images, i)
                fig.savefig(os.path.join(
                    self.log_dir, f"test_sample_{i}_{epoch}.png"))
                plt.close(fig)

        # CSV row (`callback.py:211-218`). Header iff the file is new/empty —
        # the reference keys this on epoch == 0, which duplicates the header
        # when a run restarts from scratch over an existing log (SURVEY.md §7
        # quirks).
        write_header = (not os.path.exists(self.log_csv)
                        or os.path.getsize(self.log_csv) == 0)
        with open(self.log_csv, "a") as f:
            row = {"epoch": epoch}
            row.update(logs)
            writer = DictWriter(f, row.keys())
            if write_header:
                writer.writeheader()
            writer.writerow(row)

        # Periodic checkpoint (`callback.py:220-222`).
        self.model.save_model(self.log_model_dir, weights_only=(epoch != 0))

        if self.verbose:
            self.coarse_log_list_batch = []
            self.fine_log_list_batch = []

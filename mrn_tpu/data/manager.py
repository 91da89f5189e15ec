"""Incremental data-stream management (reference: data/data_manage.py).

``DatasetManager`` reproduces the reference policies exactly:
- per-task dataset construction over all data roots with small-dataset
  repetition to ~50k samples (data_manage.py:127-146);
- rehearsal-memory mixing: the MRN branch builds one mixed
  IndexConcatDataset([memory, current-subset]) stream whose batches carry the
  binary memory/current index (data_manage.py:23-29), the default branch runs
  two half-batch loaders (data_manage.py:55-58);
- round-robin balanced batching with StopIteration restart
  (get_batch/get_batch2, data_manage.py:174-217);
- ``ValDataset``: current-task loader and the <=700-per-set all-task loader
  (data_manage.py:219-269).

Host-side loaders hand fixed-shape float32 NHWC batches to the jitted steps;
evaluation batches are padded to a constant batch size so eval compiles once.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import numpy as np

from mrn_tpu.data.dataset import (ConcatDataset, DeviceImageBank,
                                  IndexConcatDataset, LmdbDataset, Subset,
                                  bank_dataset, hierarchical_dataset)
from mrn_tpu.data.transform import build_transform

__all__ = ["EpochLoader", "DatasetManager", "ValDataset"]


class EpochLoader:
    """DataLoader(shuffle=True, drop_last=False) equivalent with epoch
    reshuffling; ``next_batch`` auto-restarts like the reference's
    StopIteration handling (data_manage.py:198-217)."""

    def __init__(self, dataset, batch_size: int, transform, shuffle: bool = True,
                 with_index: bool = False, pad_to_batch: bool = False,
                 rng: Optional[np.random.Generator] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.transform = transform
        self.shuffle = shuffle
        self.with_index = with_index
        self.pad_to_batch = pad_to_batch
        self.rng = rng or np.random.default_rng()
        self._order = None
        self._pos = 0
        self._new_epoch()

    def _new_epoch(self):
        n = len(self.dataset)
        self._order = self.rng.permutation(n) if self.shuffle else np.arange(n)
        self._pos = 0

    def __len__(self):
        return -(-len(self.dataset) // self.batch_size)

    def _collate(self, items):
        if self.with_index:
            pairs, idxs = zip(*items)
        else:
            pairs, idxs = items, None
        images = [self.transform(im) for im, _ in pairs]
        labels = [lb for _, lb in pairs]
        n_valid = len(images)
        if self.pad_to_batch and n_valid < self.batch_size:
            pad = self.batch_size - n_valid
            images += [np.zeros_like(images[0])] * pad
            labels += [""] * pad
        batch = np.stack(images)
        # bank-index batches stay int32 (device-side gather); image batches
        # are float32
        batch = batch.astype(np.int32 if np.issubdtype(batch.dtype, np.integer)
                             else np.float32)
        if self.with_index:
            return batch, labels, np.asarray(idxs, dtype=np.int32)
        if self.pad_to_batch:
            return batch, labels, n_valid
        return batch, labels

    def next_batch(self):
        if self._pos >= len(self._order):
            self._new_epoch()
        sel = self._order[self._pos:self._pos + self.batch_size]
        self._pos += self.batch_size
        return self._collate([self.dataset[int(i)] for i in sel])

    def skip_batch(self):
        """Advance the stream by one batch WITHOUT materializing images —
        identical index/rng consumption to next_batch.  Used by full-state
        resume to fast-forward the loader to a checkpointed iteration."""
        if self._pos >= len(self._order):
            self._new_epoch()
        self._pos += self.batch_size

    def __iter__(self):
        self._new_epoch()
        while self._pos < len(self._order):
            yield self.next_batch()


class DatasetManager:
    """The incremental stream builder (reference Dataset_Manager)."""

    def __init__(self, opt, dataset_factory: Optional[Callable] = None,
                 seed: Optional[int] = None):
        self.opt = opt
        self.select_data: Optional[Sequence[str]] = None
        self.data_list: List = []          # joint_mix accumulation
        self.loaders: List[EpochLoader] = []
        # reference uses the global numpy RNG; we keep an explicit generator
        self.rng = np.random.default_rng(opt.manual_seed if seed is None else seed)
        # factory(data_root, taski, mode) -> dataset; default: LMDB layout
        self._factory = dataset_factory or self._lmdb_factory

    # -- dataset construction ------------------------------------------------

    def _lmdb_factory(self, data_root: str, taski: int, mode: str):
        bank = self.opt.get("image_bank")
        if isinstance(bank, DeviceImageBank):
            # decode+resize each task's LMDB once into the device bank;
            # rehearsal rebuilds previous tasks' datasets every stage, so the
            # banked view is cached (on the bank, keyed by root+task — the
            # cache dies with the run)
            key = ("train", data_root, taski, mode)
            cached = bank.datasets.get(key)
            if cached is None:
                ds = LmdbDataset(data_root + "/" + self.opt.lan_list[taski],
                                 self.opt, mode=mode)
                cached = bank_dataset(ds, self.opt, bank)
                bank.datasets[key] = cached
            return cached
        return LmdbDataset(data_root + "/" + self.opt.lan_list[taski], self.opt,
                           mode=mode)

    def create_dataset(self, data_list=None, taski: int = 0, mode: str = "train",
                       repeat: bool = True):
        """Per-task dataset over all roots; small datasets repeated to ~50k
        (data_manage.py:127-146)."""
        datasets = []
        for data_root in (data_list or self.select_data):
            ds = self._factory(data_root, taski, mode)
            if len(ds) < 50000 and repeat:
                ds = ConcatDataset([ds] * int(50000 / len(ds)))
            datasets.append(ds)
        return ConcatDataset(datasets)

    def _train_transform(self):
        return build_transform(self.opt, mode="train")

    def _add_loader(self, dataset, batch_size=None, with_index=False):
        self.loaders.append(EpochLoader(
            dataset, batch_size or self.opt.batch_size, self._train_transform(),
            shuffle=True, with_index=with_index, rng=self.rng))

    # -- public policy surface (data_manage.py:16-95) ------------------------

    def init_start(self, opt, select_data, log, taski):
        self.opt = opt
        self.select_data = select_data
        self.loaders = []
        if log is not None:
            log.write(f"select_data: {select_data}\n")
        self.get_dataset(taski, memory=None)

    def joint_start(self, opt, select_data, log, taski, total_task):
        self.opt = opt
        self.select_data = select_data
        dataset = self.create_dataset(data_list=select_data, taski=taski)
        if opt.il == "joint_mix":
            self.data_list.append(dataset)
            if taski == total_task - 1:
                self._add_loader(ConcatDataset(self.data_list), int(opt.batch_size))
        elif opt.il == "joint_loader":
            self._add_loader(dataset, int(opt.batch_size // total_task))

    def get_dataset(self, taski, memory="random", index_list=None):
        self.loaders = []
        # full-state resume replays this build after restoring the generator
        # to this exact state, reproducing loader shuffles bitwise
        self.rng_state_at_build = self.rng.bit_generator.state
        memory_num = self.opt.memory_num
        dataset = self.create_dataset(data_list=self.select_data, taski=taski)

        if memory is not None and self.opt.il == "mrn":
            index_current = self.rng.choice(len(dataset),
                                            int(memory_num / taski), replace=False)
            split_dataset = Subset(dataset, index_current.tolist())
            if self.opt.get("router_labels", "reference") == "task":
                # extension: true per-task expert labels — flat list of
                # per-task subsets so dataset_idx == task id
                num_i = int(memory_num / taski)
                parts = []
                for i in range(taski):
                    ds_i = self.create_dataset(data_list=self.select_data,
                                               taski=i, repeat=False)
                    parts.append(Subset(ds_i, list(index_list[i])))
                parts.append(split_dataset)
                self._add_loader(IndexConcatDataset(parts),
                                 self.opt.batch_size, with_index=True)
            else:
                # reference behaviour: one mixed stream tagged
                # memory(0)/current(1) (data_manage.py:23-29 — the rehearsal
                # ConcatDataset nests as ONE IndexConcatDataset element)
                memory_data, index_list = self.rehearsal_memory(
                    taski, total_num=memory_num, index_array=index_list)
                self._add_loader(IndexConcatDataset([memory_data, split_dataset]),
                                 self.opt.batch_size, with_index=True)
        elif memory == "test_ch":
            # mem: num (repeat-expanded) + curr: total, one mixed stream
            # (data_manage.py:30-36). NOTE: in the reference these three mix
            # policies are unusable outside il=mrn — get_batch unpacks the
            # mix loader's 3-tuple into 2 and the `except ValueError: pass`
            # (data_manage.py:212-213) silently drops the whole loader. Here
            # they build a plain (un-indexed) mixed loader, so every
            # memoryful learner can actually consume them.
            memory_data, index_list = self.rehearsal_memory(
                taski, total_num=memory_num, index_array=index_list,
                repeat=True)
            self._add_loader(ConcatDataset([memory_data, dataset]),
                             self.opt.batch_size)
        elif memory == "large":
            # mem: num*taski + curr: num (data_manage.py:37-44)
            index_current = self.rng.choice(len(dataset), memory_num,
                                            replace=False)
            split_dataset = Subset(dataset, index_current.tolist())
            memory_data, index_list = self.rehearsal_memory(
                taski, total_num=memory_num * taski, index_array=index_list)
            self._add_loader(ConcatDataset([memory_data, split_dataset]),
                             self.opt.batch_size)
        elif memory == "total":
            # curr: total + every previous task in full (data_manage.py:45-54)
            total_list = [dataset]
            for i in range(taski):
                total_list.append(
                    self.create_dataset(data_list=self.select_data, taski=i))
            self._add_loader(ConcatDataset(total_list), self.opt.batch_size)
        elif memory is not None:
            # two half-batch loaders (data_manage.py:55-58)
            memory_data, index_list = self.rehearsal_memory(
                taski, total_num=memory_num, index_array=index_list)
            self._add_loader(memory_data, self.opt.batch_size // 2)
            self._add_loader(dataset, self.opt.batch_size // 2)
        else:
            self._add_loader(dataset)
        return index_list

    def rehearsal_memory(self, taski, total_num=2000, index_array=None,
                         repeat=False):
        """Concat of per-previous-task subsets selected by stored indices
        (data_manage.py:97-111)."""
        data_list = []
        for i in range(taski):
            ds = self.create_dataset(data_list=self.select_data, taski=i,
                                     repeat=repeat)
            index_list = index_array[i]
            data_list.append(Subset(ds, list(index_list)))
        return ConcatDataset(data_list), index_array

    def rehearsal_prev_model(self, taski):
        ds = self.create_dataset(data_list=self.select_data, taski=taski - 1,
                                 repeat=False)
        return None, len(ds)

    # -- batching (data_manage.py:174-217) -----------------------------------

    def get_batch(self):
        images, labels = [], []
        for loader in self.loaders:
            im, lb = loader.next_batch()
            images.append(im)
            labels += list(lb)
        return np.concatenate(images, 0), labels

    def get_batch2(self):
        images, labels, idxs = [], [], []
        for loader in self.loaders:
            im, lb, ix = loader.next_batch()
            images.append(im)
            labels += list(lb)
            idxs.append(ix)
        return np.concatenate(images, 0), labels, np.concatenate(idxs, 0)

    def skip_batches(self, n: int):
        """Fast-forward the stream by ``n`` get_batch rounds (each round draws
        one batch per loader, in loader order — the exact consumption pattern
        of the training loop) without materializing any images."""
        for _ in range(n):
            for loader in self.loaders:
                loader.skip_batch()


class ValDataset:
    """Validation loader builder (reference Val_Dataset, data_manage.py:219-269)."""

    def __init__(self, val_datas, opt, dataset_factory: Optional[Callable] = None,
                 seed: Optional[int] = None):
        self.val_datas = list(val_datas)
        self.current_data = self.val_datas[-1]
        self.opt = opt
        self.rng = np.random.default_rng(opt.manual_seed if seed is None else seed)
        self._factory = dataset_factory or self._lmdb_factory
        self.transform = build_transform(opt, mode="test")

    def _lmdb_factory(self, val_data: str):
        bank = self.opt.get("image_bank")
        if isinstance(bank, DeviceImageBank):
            key = ("val", val_data)
            cached = bank.datasets.get(key)
            if cached is None:
                ds, _ = hierarchical_dataset(root=val_data, opt=self.opt,
                                             mode="test")
                cached = bank_dataset(ds, self.opt, bank)
                bank.datasets[key] = cached
            return cached
        ds, _ = hierarchical_dataset(root=val_data, opt=self.opt, mode="test")
        return ds

    def _loader(self, dataset):
        # shuffle=False for parity with the reference eval order (test.py's
        # eval DataLoader) — keeps printed GT/pred samples and best-checkpoint
        # tie-breaks deterministic across runs.
        return EpochLoader(dataset, self.opt.batch_size, self.transform,
                           shuffle=False, pad_to_batch=True, rng=self.rng)

    def create_dataset(self, val_data=None):
        return self._loader(self._factory(val_data or self.current_data))

    def create_list_dataset(self, valid_datas=None):
        concat = []
        for val_data in (valid_datas or self.val_datas):
            ds = self._factory(val_data)
            if len(ds) > 700:  # cap per test set (data_manage.py:254-256)
                idx = self.rng.choice(len(ds), 700, replace=False)
                ds = Subset(ds, idx.tolist())
            concat.append(ds)
        return self._loader(ConcatDataset(concat))

"""CLI flag parity: names and defaults must match the reference's argparse
(train.py:199-225, eval.py:25-36) exactly."""

import argparse

from pmpu_tpu.config import add_eval_args, add_train_args, config_from_args


def test_train_flag_defaults_match_reference():
    p = argparse.ArgumentParser()
    args = add_train_args(p).parse_args([])
    assert args.epochs == 5
    assert args.batchsize == 2
    assert args.lr == 0.001
    assert args.lrf == 0.1
    assert args.lrp == 5
    assert args.om == 0.9
    assert args.load is None
    assert args.scale == 1
    assert args.val == 10.0
    assert args.net == "unet"
    assert args.dir is None


def test_train_short_flags_accepted():
    p = argparse.ArgumentParser()
    args = add_train_args(p).parse_args(
        ["-e", "7", "-b", "4", "-l", "0.01", "-r", "0.5", "-p", "3",
         "-o", "0.8", "-f", "ck.pt", "-s", "2", "-v", "20", "-m", "probunet", "-d", "DATA"]
    )
    cfg = config_from_args(args)
    assert cfg.epochs == 7 and cfg.batchsize == 4 and cfg.lr == 0.01
    assert cfg.lrf == 0.5 and cfg.lrp == 3 and cfg.om == 0.8
    assert cfg.load == "ck.pt" and cfg.scale == 2 and cfg.val == 20
    assert cfg.net == "probunet" and cfg.dir == "DATA"
    assert cfg.resolved_n_classes() == 3  # probunet default (train.py:244)


def test_eval_flags_match_reference():
    p = argparse.ArgumentParser()
    args = add_eval_args(p).parse_args(["-f", "m.pt", "-d", "D", "-m", "probunet"])
    assert args.load == "m.pt" and args.dir == "D" and args.net == "probunet"


def test_unet_default_single_class():
    p = argparse.ArgumentParser()
    cfg = config_from_args(add_train_args(p).parse_args([]))
    assert cfg.resolved_n_classes() == 1  # train.py:242 builds binary UNet


def test_extension_flags():
    p = argparse.ArgumentParser()
    cfg = config_from_args(
        add_train_args(p).parse_args(
            ["--num-filters", "8,16,32", "--bf16", "--num-views", "6", "--augment", "--remat"]
        )
    )
    assert cfg.num_filters == (8, 16, 32)
    assert cfg.bf16 and cfg.num_views == 6 and cfg.augment and cfg.remat
    assert cfg.slice_filter  # default preserves reference train filtering


def test_include_empty_slices_flag_reaches_index_map():
    import numpy as np

    from pmpu_tpu.data.index_map import build_index_map

    p = argparse.ArgumentParser()
    cfg = config_from_args(add_train_args(p).parse_args(["--include-empty-slices"]))
    assert cfg.slice_filter is False

    lbls = np.zeros((1, 4, 4, 4), np.int32)
    lbls[0, 1, :, :] = 1  # one nonempty slice in view 0 only
    filtered = build_index_map(lbls, filter=True)
    full = build_index_map(lbls, filter=cfg.slice_filter)
    assert len(full) == 3 * 4  # every (view, slice) kept
    assert len(filtered) < len(full)


def test_round5_flags_reach_config_and_task():
    """--split-decoder / --identity-affine / --autosave-minutes /
    --rss-limit-mb parse into Config; split_decoder reaches the model via
    task_kwargs (identical param tree — test_models.py pins numerics)."""
    from pmpu_tpu.train.tasks import make_task

    p = argparse.ArgumentParser()
    cfg = config_from_args(add_train_args(p).parse_args([
        "--split-decoder", "--identity-affine",
        "--autosave-minutes", "2.5", "--rss-limit-mb", "4096",
        "--num-filters", "4,8",
    ]))
    assert cfg.split_decoder and cfg.identity_affine
    assert cfg.autosave_minutes == 2.5 and cfg.rss_limit_mb == 4096
    task = make_task("probunet", **cfg.task_kwargs())
    assert task.net.split_decoder is True
    task_u = make_task("unet", **cfg.task_kwargs())
    assert task_u.net.split_decoder is True

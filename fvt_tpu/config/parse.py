"""CLI parsing + config merge + experiment dir setup (tiers 2 and 3).

Port of /root/reference/parseit.py:90-519 semantics:
  * every config key is an argparse flag; None means "keep the default";
  * sanity asserts (modality whitelist, dataset/task pairing);
  * TRAINING mode derives a fresh ``outd`` and snapshots ``config.yml``;
  * EVALUATION mode reloads a saved ``config.yml`` and retargets the
    dataset (parseit.py:441-489), with num_workers=0 and fold 0.
"""
from __future__ import annotations

import argparse
import datetime as dt
import os
import sys
from os.path import join
from types import SimpleNamespace

import yaml

from fvt_tpu import constants
from fvt_tpu.config.defaults import get_config
from fvt_tpu.utils.logger import init_logger, log, fmsg


def str2bool(v):
    if isinstance(v, bool):
        return v
    if v.lower() in ('yes', 'true', 't', 'y', '1'):
        return True
    if v.lower() in ('no', 'false', 'f', 'n', '0'):
        return False
    raise argparse.ArgumentTypeError('boolean value expected')


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description='fvt_tpu')
    parser.add_argument('--dataset_name', type=str, default=constants.MELD)
    parser.add_argument('--mode', type=str, default=None)
    parser.add_argument('--fd_exp', type=str, default=None,
                        help='EVALUATION: dir of a finished TRAINING run')
    parser.add_argument('--target_ds_name', type=str, default=None,
                        help='EVALUATION: dataset to retarget to')
    parser.add_argument('--eval_set', type=str, default=None,
                        help='EVALUATION: split to evaluate')
    parser.add_argument('--case_best_model', type=str, default=None,
                        help='EVALUATION: which best-model criterion')

    # every default key becomes an override flag
    proto = get_config(constants.MELD)
    for k, v in proto.items():
        if k in ('dataset_name', 'mode'):
            continue
        if isinstance(v, bool):
            parser.add_argument(f'--{k}', type=str2bool, default=None)
        elif isinstance(v, int):
            parser.add_argument(f'--{k}', type=int, default=None)
        elif isinstance(v, float):
            parser.add_argument(f'--{k}', type=float, default=None)
        else:
            parser.add_argument(f'--{k}', type=str, default=None)
    return parser


def sanity_check(config: dict):
    assert config['dataset_name'] in constants.DATASETS
    assert config['model_name'] in constants.FUSION_METHODS
    modalities = config['modality'].split('+')
    assert len(modalities) > 0
    for m in modalities:
        assert m in constants.MODALITIES + ['logmel'], m
    # the label stream is mandatory (parseit.py:327); without it the
    # failure would otherwise surface as a KeyError deep inside jit
    assert constants.EXPR in modalities, \
        f"modality must include {constants.EXPR}"
    if config['use_other_class']:
        assert config['dataset_name'] == constants.C_EXPR_DB
    assert config['opt__name_optimizer'] in constants.OPTIMIZERS
    assert config['opt__name_lr_scheduler'] in constants.LR_SCHEDULERS
    # MYWARMUP's plateau decay consumes the validation master metric; for
    # classification that is a W-F1 (higher is better), so opt__mode MIN
    # would silently decay the lr every plateau window.  The reference
    # shares this foot-gun (base/scheduler.py:129-141) — we reject it at
    # parse time instead of warning mid-run.
    if (config['opt__name_lr_scheduler'] == constants.MYWARMUP
            and config.get('task') == constants.CLASSIFICATION):
        assert config['opt__mode'] == constants.MAX_MODE, \
            ('MYWARMUP with a classification task tracks the validation '
             'W-F1 master metric (higher is better): set --opt__mode '
             f'{constants.MAX_MODE}, got {config["opt__mode"]!r}')
    # the reference's eval path assumes whole-video items (trainer.py:447
    # "# assumes no windowing" — window_eval=True silently overwrites
    # per-trial logits there); long LFAN videos are stitch-windowed at
    # inference instead, so the flag is rejected rather than crashing later
    assert not config.get('window_eval', False), \
        'window_eval=True is unsupported: eval uses whole videos + the ' \
        'window-stitch inference path for long LFAN videos'
    sq = config.get('serve_quant', 'none')
    assert sq in ('none', 'int8', 'int8_static'), sq
    # int8 changes numerics — it is a SERVING knob; training must keep
    # the reference's fp32/bf16 math
    if sq != 'none':
        assert config.get('mode') != constants.TRAINING, \
            '--serve_quant is inference-only (use it with --mode ' \
            'EVALUATION / inference_challenge)'
    if sq == 'int8_static':
        # static scales ride the standard eval step (calibrated
        # collection closed over in make_eval_step); the Pallas serving
        # step applies the backbone itself and would silently drop them
        assert not config.get('pallas_serving', False), \
            '--serve_quant int8_static is incompatible with ' \
            '--pallas_serving (use dynamic int8 there)'


def make_outd(config: dict, base: str = None) -> str:
    base = base or join(os.getcwd(), 'exps')
    stamp = dt.datetime.now().strftime('%m-%d-%H-%M-%S-%f')
    tag = (f"{config['dataset_name']}-{config['model_name']}"
           f"-fold{config['fold_to_run']}-{config['exp_id']}-{stamp}")
    outd = join(base, tag)
    os.makedirs(outd, exist_ok=True)
    return outd


def parse_input(argv=None) -> SimpleNamespace:
    parser = build_parser()
    args = parser.parse_args(argv)

    assert args.mode is None or args.mode in constants.MODES, \
        f"--mode must be one of {constants.MODES}, got {args.mode!r}"
    if args.mode == constants.EVALUATION:
        return _parse_eval(args)

    config = get_config(args.dataset_name)
    for k, v in vars(args).items():
        if k in ('fd_exp', 'target_ds_name', 'eval_set', 'case_best_model'):
            continue
        if v is not None and k in config:
            config[k] = v
    config['mode'] = constants.TRAINING
    sanity_check(config)

    if not config['outd']:
        config['outd'] = make_outd(config)
    os.makedirs(config['outd'], exist_ok=True)

    # finished-run idempotency gate (parseit.py:311-315)
    if os.path.isfile(join(config['outd'], 'passed.txt')):
        print(f"Experiment {config['outd']} already passed. Exiting.")
        sys.exit(0)

    config['t0'] = dt.datetime.now()
    init_logger(config['outd'], verbose=config['verbose'])
    log(fmsg(f"Starting experiment: {config['outd']}"))

    with open(join(config['outd'], 'config.yml'), 'w') as f:
        yaml.dump({k: str(v) if isinstance(v, dt.datetime) else v
                   for k, v in config.items()}, f)

    return SimpleNamespace(**config)


def _parse_eval(args) -> SimpleNamespace:
    """EVALUATION: reload the frozen run config, retarget the dataset."""
    fd_exp = args.fd_exp
    assert fd_exp and os.path.isdir(fd_exp), fd_exp
    with open(join(fd_exp, 'config.yml'), 'r') as f:
        config = yaml.safe_load(f)

    target_ds = args.target_ds_name or constants.C_EXPR_DB_CHALLENGE
    config['mode'] = constants.EVALUATION
    config['dataset_name'] = target_ds
    # num_classes stays the TRAINING config's: the model head must match
    # the trained checkpoint, not the eval dataset (the reference keeps
    # the reloaded config's value, parseit.py:467-489)
    config['fold_to_run'] = 0
    config['num_workers'] = 0
    config['fd_exp'] = fd_exp
    # eval_set names the output artifacts (eval-<set>-perf.pkl etc.),
    # exactly like the reference's log/result naming (parseit.py:460,
    # 495-497); the evaluated loader is the test split, which on the
    # challenge dataset aliases the whole store. Validate membership at
    # parse like the reference (parseit.py:456) so a typo fails here.
    config['eval_set'] = args.eval_set or constants.TESTSET
    assert config['eval_set'] in (constants.TRAINSET, constants.VALIDSET,
                                  constants.TESTSET), config['eval_set']
    config['case_best_model'] = args.case_best_model
    # retarget folds to the eval dataset (parseit.py:482) and undo any
    # debug subsampling from the training run (parseit.py:484-488) —
    # leaked train_p<100 would Bernoulli-drop challenge videos from the
    # prediction dump
    config['folds_dir'] = join(os.path.dirname(
        config.get('folds_dir', 'folds')), target_ds)
    config['train_p'] = config['valid_p'] = config['test_p'] = 100.0
    config['num_folds'] = 1

    outd = join(config['fd_exp'], f"eval-{target_ds}")
    config['outd'] = outd

    # explicit CLI overrides still win (paths etc.)
    for k, v in vars(args).items():
        if v is not None and k in ('dataset_path', 'folds_dir', 'outd',
                                   'eval_bucket_quantum', 'train_p',
                                   'valid_p', 'test_p', 'serve_quant',
                                   'pallas_serving'):
            config[k] = v
    assert config.get('serve_quant', 'none') in ('none', 'int8',
                                                 'int8_static'), \
        config.get('serve_quant')
    if config.get('serve_quant') == 'int8_static':
        # same incompatibility sanity_check enforces at TRAINING parse:
        # the Pallas serving step applies the backbone itself and would
        # silently drop the calibrated static scales
        assert not config.get('pallas_serving', False), \
            '--serve_quant int8_static is incompatible with ' \
            '--pallas_serving (use dynamic int8 there)'

    assert os.path.isdir(config['folds_dir']), (
        f"eval folds_dir not found: {config['folds_dir']!r} — the "
        f"training run's folds root was retargeted to {target_ds}; pass "
        f"--folds_dir explicitly when the eval dataset's folds live "
        f"elsewhere (e.g. <dataset_path>/folds/{target_ds})")

    os.makedirs(config['outd'], exist_ok=True)
    outd = config['outd']

    config['t0'] = dt.datetime.now()
    init_logger(outd, verbose=config.get('verbose', True))
    log(fmsg(f"Evaluation run: {outd} (model from {fd_exp})"))
    return SimpleNamespace(**config)

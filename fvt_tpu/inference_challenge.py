"""Challenge inference CLI (mirror of /root/reference/inference_challenge.py).

Loads a finished TRAINING run's frozen config, retargets to
C-EXPR-DB-CHALLENGE, restores the requested best model and dumps
``pred-C-EXPR-DB-CHALLENGE/prediction.pkl``.

Usage:
  python -m fvt_tpu.inference_challenge --mode EVALUATION \
      --fd_exp <training-run-dir> --case_best_model <item> \
      --dataset_path <challenge-root> [--folds_dir <folds>]
"""
import os
from os.path import join

from fvt_tpu import constants
from fvt_tpu.config.parse import parse_input
from fvt_tpu.experiment import Experiment
from fvt_tpu.utils.logger import enable_jit_cache


def main(argv=None):
    enable_jit_cache()
    args = parse_input(argv)
    assert args.mode == constants.EVALUATION, args.mode

    exp = Experiment(args)
    exp.prepare()

    case = args.case_best_model
    best_dir = join(args.fd_exp, 'best-models')
    if case is None:
        cases = sorted(os.listdir(best_dir))
        assert cases, best_dir
        case = cases[0]
    path_model = join(best_dir, case, 'model.msgpack')
    if not os.path.isfile(path_model):
        path_model = join(best_dir, case, 'model.pt')
    perf, per_video = exp.run_eval(path_model=path_model)

    # persist the evaluation for EVERY target (the reference only dumps
    # the challenge prediction.pkl and discards labeled-set perf): the
    # nested perf dict, per-frame logits, and a human-readable report
    import pickle as pkl
    from fvt_tpu.train import metrics as M
    eval_set = getattr(args, 'eval_set', constants.TESTSET)
    with open(join(args.outd, f'eval-{eval_set}-perf.pkl'), 'wb') as f:
        pkl.dump(perf, f, protocol=pkl.HIGHEST_PROTOCOL)
    with open(join(args.outd,
                   f'pred-per-frame-eval-{eval_set}.pkl'), 'wb') as f:
        pkl.dump(per_video, f, protocol=pkl.HIGHEST_PROTOCOL)
    trackers = M.build_trackers(args.dataset_name,
                                getattr(args, 'use_other_class', False))
    reporter = next(iter(trackers.values()))
    with open(join(args.outd, f'eval-{eval_set}-perf.txt'), 'w') as f:
        f.write(reporter.report(perf, exp.data_arranger.int_to_cl))


if __name__ == '__main__':
    main()

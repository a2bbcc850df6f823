#!/usr/bin/env python
"""Challenge/eval inference from a FROZEN serving artifact — no model
code, no checkpoint: the serving host needs the feature store, the run
dir's frozen config, and one ``.fvtserve`` (fvt_tpu/export.py).

Mirror of ``python -m fvt_tpu.inference_challenge`` (itself the mirror
of /root/reference/inference_challenge.py) with the model replaced by
the artifact's already-traced program.  LFAN only: its eval contract —
window-and-stitch for videos longer than the model window
(/root/reference/trainer.py:832-892), whole-window forward for the rest
(pad-by-repeat makes every built video at least one window long) — lets
EVERY video ride the single exported ``(window_batch, window)`` shape:
window rows of all videos are pooled into fixed batches and each
video's logits are stitched back (the same `stitch_windows_np` the
Trainer uses).  Per-video outputs match `Trainer.inference` to float32
reduction-order tolerance (different batch shapes compile different XLA
programs), pinned by tests/test_export_serving.py.

Usage (same retargeting flags as inference_challenge):
  python tools/infer_artifact.py --mode EVALUATION \
      --fd_exp <training-run-dir> --artifact <path.fvtserve> \
      --dataset_path <challenge-root> [--target_ds_name ...] \
      [--folds_dir <folds>] [--mesh N]

``--mesh N`` runs each pooled window batch data-parallel over an
N-device 'data' mesh (ServingArtifact.call_sharded); the artifact's
window_batch must divide by N.
"""
import os
import sys
from os.path import join

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def run(args, artifact_path: str, mesh_devices: int = 0):
    """Returns (perf, per_video_frame_logits, experiment);  the first
    two match Trainer.inference's contract."""
    from fvt_tpu import constants
    from fvt_tpu.data import windowing as W
    from fvt_tpu.data.transforms import (CROP_SIZE, SCALE_SIZE,
                                         center_crop_offset)
    from fvt_tpu.experiment import Experiment
    from fvt_tpu.export import load_artifact
    from fvt_tpu.train import metrics as M
    from fvt_tpu.utils.logger import log

    assert args.model_name == constants.LFAN, (
        f"artifact inference implements the LFAN window-serving "
        f"contract; {args.model_name} eval runs per-video bucket shapes "
        f"— serve it via inference_challenge")

    art = load_artifact(artifact_path)
    window = int(args.window_length)
    hop = int(args.hop_length)
    key = next((k for k, v in art.meta['shapes'].items()
                if v['seq_len'] == window), None)
    assert key is not None, (
        f"artifact has no export at seq_len == window_length ({window}); "
        f"available: {art.meta['shapes']}")
    spec = art.meta['shapes'][key]['inputs']
    wb = art.meta['shapes'][key]['window_batch']

    mesh = None
    if mesh_devices:
        from fvt_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(mesh_devices)
        assert wb % mesh_devices == 0, (
            f"artifact window_batch {wb} must divide by --mesh "
            f"{mesh_devices}")

    def call(inputs):
        return art.call_sharded(inputs, mesh=mesh) if mesh is not None \
            else art.call(inputs)

    exp = Experiment(args)
    exp.prepare()
    loaders = exp.init_loaders()
    eval_set = getattr(args, 'eval_set', None) or constants.TESTSET
    loader = loaders[eval_set]

    def conform(k, arr):
        """Match the artifact's recorded dtype (bf16 features etc.)."""
        want = np.dtype(spec[k]['dtype']) if spec[k]['dtype'] != \
            'bfloat16' else None
        if want is None:
            import ml_dtypes
            return arr.astype(ml_dtypes.bfloat16)
        return arr if arr.dtype == want else arr.astype(want)

    precrop_to = spec[constants.VIDEO]['shape'][-2] \
        if constants.VIDEO in spec else None

    # pooled window rows across ALL videos -> fixed (wb, window) batches
    per_video = {}
    wstate = {}
    wqueue = []

    def dispatch(flush=False):
        while len(wqueue) >= wb or (flush and wqueue):
            take = wqueue[:wb]
            del wqueue[:wb]
            rows = take + [take[-1]] * (wb - len(take))
            inputs = {k: np.stack([wstate[t]['arrs'][k][r]
                                   for (t, r) in rows])
                      for k in wstate[rows[0][0]]['arrs']}
            out = np.asarray(call(inputs))
            for i, (trial, r) in enumerate(rows):
                st = wstate.get(trial)
                if st is None or st['done'][r]:
                    continue  # tail-padding duplicate
                st['outs'][r] = out[i]
                st['done'][r] = True
            for trial in [t for t in wstate if wstate[t]['done'].all()]:
                st = wstate.pop(trial)
                per_video[trial] = {
                    'labels': st['labels'],
                    'logits': W.stitch_windows_np(
                        st['outs'], st['mat'], st['true_len'])}

    for batch, trials, true_lens, bucket in loader.batches(
            1, windowed_threshold=None,
            center_crop=(precrop_to if precrop_to else None)):
        labels = batch.pop(constants.EXPR)
        trial, true_len = trials[0], true_lens[0]
        v = batch.get(constants.VIDEO)
        if (v is not None and precrop_to
                and v.shape[-2] == SCALE_SIZE == v.shape[-3]):
            off = center_crop_offset(SCALE_SIZE, precrop_to)
            batch[constants.VIDEO] = np.ascontiguousarray(
                v[..., off:off + precrop_to, off:off + precrop_to, :])
        mat = W.window_index_matrix(true_len, window, hop)
        n_win = mat.shape[0]
        arrs = {}
        for k, arr in batch.items():
            arr = conform(k, arr[0])
            arrs[k] = arr[mat.reshape(-1)].reshape(
                (n_win, window) + arr.shape[1:])
        wstate[trial] = dict(
            mat=mat, n_win=n_win, true_len=true_len,
            labels=np.asarray(labels[0, :true_len]).flatten(),
            arrs=arrs, done=np.zeros(n_win, bool),
            outs=np.empty((n_win, window,
                           int(args.num_classes)), np.float32))
        wqueue.extend((trial, r) for r in range(n_win))
        dispatch()
    dispatch(flush=True)
    assert not wstate and not wqueue, (list(wstate), len(wqueue))

    want = {item[1] for item in loader.work_list}
    assert set(per_video) == want, (
        sorted(want - set(per_video))[:5])
    per_video = {item[1]: per_video[item[1]]
                 for item in loader.work_list}

    perf = M.compute_perf(per_video, args.dataset_name,
                          args.use_other_class)

    if args.dataset_name == constants.C_EXPR_DB_CHALLENGE:
        import pickle as pkl
        out_inf = join(args.outd, f'pred-{constants.C_EXPR_DB_CHALLENGE}')
        os.makedirs(out_inf, exist_ok=True)
        with open(join(out_inf, 'prediction.pkl'), 'wb') as f:
            pkl.dump(per_video, f, protocol=pkl.HIGHEST_PROTOCOL)
        log(f"Dumped {constants.C_EXPR_DB_CHALLENGE} predictions at "
            f"{join(out_inf, 'prediction.pkl')}")
    return perf, per_video, exp


def main(argv=None):
    from fvt_tpu import constants
    from fvt_tpu.config.parse import parse_input
    from fvt_tpu.train import metrics as M
    from fvt_tpu.utils.logger import enable_jit_cache

    # --artifact/--mesh are ours; everything else is inference_challenge's
    argv = list(sys.argv[1:] if argv is None else argv)
    assert '--artifact' in argv, '--artifact <path.fvtserve> required'
    i = argv.index('--artifact')
    artifact_path = argv[i + 1]
    del argv[i:i + 2]
    mesh_devices = 0
    if '--mesh' in argv:
        i = argv.index('--mesh')
        mesh_devices = int(argv[i + 1])
        del argv[i:i + 2]

    enable_jit_cache()
    args = parse_input(argv)
    assert args.mode == constants.EVALUATION, args.mode

    perf, per_video, exp = run(args, artifact_path,
                               mesh_devices=mesh_devices)

    import pickle as pkl
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

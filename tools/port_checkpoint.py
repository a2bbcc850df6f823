"""Convert checkpoints between the reference torch stack and fvt_tpu —
both directions.

torch -> fvt_tpu (msgpack):
  python tools/port_checkpoint.py --model_name LFAN \
      --modality vggish+bert \
      --in model.pt --out model.msgpack
  python tools/port_checkpoint.py --backbone arcface \
      --in res50_ir_0.887.pth --out arcface.msgpack
  python tools/port_checkpoint.py --backbone vggish \
      --in vggish.pth --out vggish.msgpack

fvt_tpu -> torch (reverse; loads into the reference model classes with
``load_state_dict(strict=True)`` — /root/reference/experiment.py:242-247):
  python tools/port_checkpoint.py --reverse --model_name LFAN \
      --modality vggish+bert \
      --in best-models/FRAMES_VOTE/model.msgpack --out model.pt
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--in', dest='inp', required=True)
    p.add_argument('--out', required=True)
    p.add_argument('--model_name', default=None,
                   choices=['LFAN', 'CAN', 'JMT', 'MT'])
    p.add_argument('--modality', default='vggish+bert')
    p.add_argument('--backbone', default=None,
                   choices=['arcface', 'vggish'])
    p.add_argument('--reverse', action='store_true',
                   help='fvt_tpu msgpack -> reference torch model.pt')
    args = p.parse_args(argv)

    import torch
    from flax import serialization
    from fvt_tpu.config import model_config as MC
    from fvt_tpu.models import torch_port as port

    if args.reverse:
        from fvt_tpu.models import torch_export
        assert args.model_name, '--reverse needs --model_name'
        with open(args.inp, 'rb') as f:
            tree = serialization.msgpack_restore(f.read())
        sd = torch_export.export_state_dict(
            args.model_name, tree['params'], tree.get('batch_stats', {}),
            args.modality.split('+'))
        # copy: msgpack_restore returns non-writable views torch warns on
        torch.save({k: torch.from_numpy(np.array(v))
                    for k, v in sd.items()}, args.out)
        print(f"exported {args.inp} -> {args.out} ({len(sd)} keys)")
        return

    sd = torch.load(args.inp, map_location='cpu')

    if args.backbone == 'arcface':
        from fvt_tpu.models.arcface import visual_backbone_from_torch
        params, stats = visual_backbone_from_torch(sd)
    elif args.backbone == 'vggish':
        from fvt_tpu.models.vggish import vggish_from_torch
        params, stats = vggish_from_torch(sd), {}
    else:
        assert args.model_name, 'need --model_name or --backbone'
        modality = args.modality.split('+')
        if args.model_name == 'LFAN':
            params, stats = port.lfan_from_torch(
                sd, modality, MC.TCN_CHANNELS, MC.EMBEDDING_DIM)
        elif args.model_name == 'CAN':
            params, stats = port.can_from_torch(sd, modality,
                                                MC.TCN_SETTINGS)
        else:
            params, stats = port.jmt_from_torch(
                sd, modality, MC.TCN_SETTINGS,
                joint=(args.model_name == 'JMT'))
        # embedded frozen backbones in tri-modal checkpoints
        sp, ss = port.spatial_from_torch(sd)
        params.update(sp)
        stats.update(ss)

    with open(args.out, 'wb') as f:
        f.write(serialization.to_bytes({'params': params,
                                        'batch_stats': stats}))
    print(f"ported {args.inp} -> {args.out}")


if __name__ == '__main__':
    main()

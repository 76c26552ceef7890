#!/usr/bin/env python
"""Convert published SONAR torch checkpoints to sonar-tpu's native format.

Usage:
  python scripts/convert_checkpoint.py text_encoder  sonar_text_encoder.pt out.npz
  python scripts/convert_checkpoint.py text_decoder  sonar_text_decoder.pt out.npz
  python scripts/convert_checkpoint.py speech        spenc.eng.pt          out.npz
  python scripts/convert_checkpoint.py blaser        model.pt              out.npz
  python scripts/convert_checkpoint.py mutox         mutox.pt              out.npz
  python scripts/convert_checkpoint.py laser2        laser2.pt             out.npz

Handles both fairseq2-native and legacy fairseq1 layouts (regex key remap +
control-token embedding permutation), converts to JAX layout (transposed
kernels, scan-stacked layers) and writes a flat .npz loadable with
``sonar_tpu.assets.checkpoint.load_params``.
"""

import argparse
import sys


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "kind",
        choices=["text_encoder", "text_decoder", "speech", "blaser", "mutox", "laser2"],
    )
    parser.add_argument("input", help="torch .pt checkpoint")
    parser.add_argument("output", help="output .npz path")
    args = parser.parse_args()

    from sonar_tpu.assets import checkpoint as ckpt

    flat = ckpt.load_torch_state_dict(args.input)
    if args.kind == "text_encoder":
        params = ckpt.text_encoder_params(flat)
    elif args.kind == "text_decoder":
        params = ckpt.text_decoder_params(flat)
    elif args.kind == "speech":
        from sonar_tpu.assets.checkpoint_speech import speech_encoder_params

        params = speech_encoder_params(flat)
    elif args.kind == "blaser":
        from sonar_tpu.models.blaser.model import blaser_params_from_torch

        params = blaser_params_from_torch(flat)
    elif args.kind == "mutox":
        from sonar_tpu.models.mutox.model import mutox_params_from_torch

        params = mutox_params_from_torch(flat)
    else:
        from sonar_tpu.models.laser2_text.model import laser2_params_from_torch

        params = laser2_params_from_torch(flat)

    ckpt.save_params(args.output, params)
    n = sum(x.size for x in ckpt.flatten_params(params).values())
    print(f"wrote {args.output}: {n/1e6:.1f}M params")
    return 0


if __name__ == "__main__":
    sys.exit(main())

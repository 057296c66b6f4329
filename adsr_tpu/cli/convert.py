"""Convert reference PyTorch checkpoints to msgpack params.

    python -m adsr_tpu.cli.convert --model-type drct \
        --torch-ckpt net_g_latest.pth --out drct_latest.msgpack \
        --resolution 128 --scale 4 --classe grid
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description="torch -> adsr_tpu checkpoint")
    p.add_argument("--model-type",
                   choices=["drct", "drn-l", "efficientad-teacher",
                            "efficientad-student",
                            "efficientad-autoencoder"],
                   required=True)
    p.add_argument("--pdn-size", choices=["small", "medium"], default="small",
                   help="PDN variant for efficientad-* conversions")
    p.add_argument("--torch-ckpt", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--classe", default="grid")
    p.add_argument("--resolution", type=int, default=128)
    p.add_argument("--scale", type=int, default=4)
    p.add_argument("--verify", action="store_true",
                   help="check converted tree matches the model param tree")
    args = p.parse_args(argv)

    import numpy as np
    import torch

    from adsr_tpu.io.journal import save_params
    from adsr_tpu.io.torch_convert import convert_drct, convert_drn

    sd = torch.load(args.torch_ckpt, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in sd.items()}

    if args.model_type.startswith("efficientad-"):
        from adsr_tpu.io.torch_convert import convert_autoencoder, convert_pdn
        if args.model_type == "efficientad-autoencoder":
            params = convert_autoencoder(sd)
        else:
            params = convert_pdn(sd, size=args.pdn_size)
        if args.verify:
            import jax
            from adsr_tpu.models.efficientad import PDN, Autoencoder
            # out_channels must come from the OUTPUT layer explicitly: the
            # autoencoder's last sorted key is 'enc5' (64ch bottleneck), not
            # the output conv 'dec7'
            if args.model_type == "efficientad-autoencoder":
                out_ch = params["dec7"]["bias"].shape[0]
                model = Autoencoder(out_channels=out_ch)
            else:
                last = max(int(k[len("conv"):]) for k in params
                           if k.startswith("conv"))
                out_ch = params[f"conv{last}"]["bias"].shape[0]
                model = PDN(out_channels=out_ch, size=args.pdn_size)
            from adsr_tpu.models.factory import fast_init
            template = fast_init(model.init, jax.random.key(0),
                                 jax.numpy.zeros((1, 256, 256, 3)))["params"]
            got = jax.tree_util.tree_map(lambda a: a.shape, params)
            want = jax.tree_util.tree_map(lambda a: a.shape, template)
            if got != want:
                raise SystemExit(f"verify failed: {got} != {want}")
            print("verify ok: tree structure and shapes match")
        save_params(args.out, params)
        print(f"wrote {args.out}")
        return
    if args.model_type == "drct":
        from adsr_tpu.io.torch_convert import stack_scan_layers
        params = convert_drct(sd)
        n_layers = 1 + max(int(k.split("_")[1]) for k in params
                           if k.startswith("rdg_"))
        params = stack_scan_layers(params, n_layers)
    else:
        from adsr_tpu.core.config import drn_experiment
        from adsr_tpu.io.torch_convert import stack_drn_rcabs
        exp = drn_experiment(classe=args.classe, resolution=args.resolution,
                             scale=args.scale)
        params = convert_drn(sd, phase=len(exp.model.scale),
                             n_blocks=exp.model.n_blocks)
        params = stack_drn_rcabs(params, phase=len(exp.model.scale),
                                 n_blocks=exp.model.n_blocks)

    if args.verify:
        import jax
        from adsr_tpu.core.config import drct_experiment, drn_experiment
        from adsr_tpu.models.factory import init_sr_params
        build = drct_experiment if args.model_type == "drct" else drn_experiment
        exp = build(classe=args.classe, resolution=args.resolution,
                    scale=args.scale)
        template, _ = init_sr_params(exp.model, jax.random.key(0))
        tmpl_paths = {"/".join(str(getattr(k, "key", k)) for k in path):
                      leaf.shape for path, leaf in
                      jax.tree_util.tree_flatten_with_path(template)[0]}
        got_paths = {"/".join(str(getattr(k, "key", k)) for k in path):
                     leaf.shape for path, leaf in
                     jax.tree_util.tree_flatten_with_path(params)[0]}
        missing = sorted(set(tmpl_paths) - set(got_paths))
        extra = sorted(set(got_paths) - set(tmpl_paths))
        shape_bad = sorted(k for k in set(tmpl_paths) & set(got_paths)
                           if tuple(tmpl_paths[k]) != tuple(got_paths[k]))
        if missing or extra or shape_bad:
            raise SystemExit(f"verify failed:\n missing={missing[:10]}\n "
                             f"extra={extra[:10]}\n shapes={shape_bad[:10]}")
        print("verify ok: tree structure and shapes match")

    save_params(args.out, params)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

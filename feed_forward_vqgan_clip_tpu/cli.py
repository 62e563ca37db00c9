"""CLI: the reference's 7 subcommands plus framework extras.

`python -m feed_forward_vqgan_clip_tpu.cli <command>` mirrors
`python main.py {train,test,tokenize,encode_text_and_images,
encode_text_and_images_webdataset,evaluate,train_prior}` (/root/reference/
main.py:1464-1473); dashes and underscores are both accepted. Extras: bench,
download-weights.
"""

import argparse
import logging
import sys


def _cmd_train(args):
    from feed_forward_vqgan_clip_tpu.config import load_config
    from feed_forward_vqgan_clip_tpu.train.loop import train

    train(load_config(args.config_file))


def _cmd_test(args):
    from feed_forward_vqgan_clip_tpu.infer import test

    test(
        args.model_path,
        args.text_or_path,
        nb_repeats=args.nb_repeats,
        out_path=args.out_path,
        images_per_row=args.images_per_row,
        prior_path=args.prior_path,
        seed=args.seed,
    )


def _cmd_tokenize(args):
    from feed_forward_vqgan_clip_tpu.data.tokenize_cli import tokenize

    tokenize(args.paths, out=args.out, max_length=args.max_length, batch_size=args.batch_size)


def _cmd_encode(args):
    from feed_forward_vqgan_clip_tpu.data.encode import encode_text_and_images

    encode_text_and_images(
        args.folder, img_ext=args.img_ext, text_ext=args.text_ext, out=args.out,
        clip_model=args.clip_model, clip_path=args.clip_path,
    )


def _cmd_encode_wds(args):
    from feed_forward_vqgan_clip_tpu.data.encode import encode_text_and_images_webdataset

    encode_text_and_images_webdataset(
        args.pattern, clip_model=args.clip_model, clip_path=args.clip_path,
        batch_size=args.batch_size, img_col=args.img_col, txt_col=args.txt_col,
        out=args.out, image_quality_threshold=args.image_quality_threshold,
        image_quality_method=args.image_quality_method,
        nima_weights_path=args.nima_weights_path,
        merge=args.merge,
    )


def _cmd_evaluate(args):
    from feed_forward_vqgan_clip_tpu.eval.evaluate import evaluate

    evaluate(
        args.model_path, args.data_path, batch_size=args.batch_size,
        out_folder=args.out_folder, clip_threshold=args.clip_threshold,
        nb_test=args.nb_test, save_images=args.save_images,
        img_folder=args.img_folder, images_per_row=args.images_per_row,
        seed=args.seed, clip_model=args.clip_model,
        clip_model_path=args.clip_model_path, compute_fid=args.compute_fid,
        inception_features_real_path=args.inception_features_real_path,
        inception_weights_path=args.inception_weights_path,
        prior_path=args.prior_path,
    )


def _cmd_train_prior(args):
    from feed_forward_vqgan_clip_tpu.config import load_config
    from feed_forward_vqgan_clip_tpu.train.prior import train_prior

    train_prior(load_config(args.config_file))


def _cmd_merge_features(args):
    from feed_forward_vqgan_clip_tpu.data.encode import merge_features

    inputs = args.inputs[0] if len(args.inputs) == 1 and any(
        ch in args.inputs[0] for ch in "*?["
    ) else args.inputs
    merge_features(inputs, args.out)


def _cmd_verify_weights(args):
    from feed_forward_vqgan_clip_tpu.verify_weights import verify_weights

    report = verify_weights(
        args.weights_dir, goldens_dir=args.goldens_dir, models=args.models or None,
        download=args.download, update_goldens=args.update_goldens,
        atol=args.atol, out=args.out,
    )
    if report["summary"]["fail"]:
        sys.exit(1)


def _cmd_download_weights(args):
    from feed_forward_vqgan_clip_tpu.download_weights import download_all

    download_all()


def _cmd_bench(args):
    import subprocess

    sys.exit(subprocess.call([sys.executable, "bench.py"]))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="ffvc", description=__doc__)
    sub = p.add_subparsers(dest="command", required=True)

    t = sub.add_parser("train", help="train a mapper (main.py:504)")
    t.add_argument("config_file")
    t.set_defaults(fn=_cmd_train)

    t = sub.add_parser("test", help="prompt(s) -> image grid (main.py:977)")
    t.add_argument("model_path")
    t.add_argument("text_or_path")
    t.add_argument("--nb-repeats", type=int, default=1)
    t.add_argument("--out-path", default="gen.png")
    t.add_argument("--images-per-row", type=int, default=None)
    t.add_argument("--prior-path", default=None)
    t.add_argument("--seed", type=int, default=None)
    t.set_defaults(fn=_cmd_test)

    t = sub.add_parser("tokenize", help="texts -> token file (main.py:395)")
    t.add_argument("paths")
    t.add_argument("--out", default="tokenized.npz")
    t.add_argument("--max-length", type=int, default=None)
    t.add_argument("--batch-size", type=int, default=None)
    t.set_defaults(fn=_cmd_tokenize)

    t = sub.add_parser(
        "encode-text-and-images", aliases=["encode_text_and_images"],
        help="(img, txt) folder -> CLIP feature pairs (main.py:231)",
    )
    t.add_argument("folder")
    t.add_argument("--img-ext", default="jpg")
    t.add_argument("--text-ext", default="txt")
    t.add_argument("--out", default="features.npz")
    t.add_argument("--clip-model", default="ViT-B/32")
    t.add_argument("--clip-path", default=None)
    t.set_defaults(fn=_cmd_encode)

    t = sub.add_parser(
        "encode-text-and-images-webdataset", aliases=["encode_text_and_images_webdataset"],
        help="webdataset tars -> CLIP feature pairs (main.py:281)",
    )
    t.add_argument("pattern")
    t.add_argument("--clip-model", default="ViT-B/32")
    t.add_argument("--clip-path", default=None)
    t.add_argument("--batch-size", type=int, default=512)
    t.add_argument("--img-col", default="input.jpg")
    t.add_argument("--txt-col", default="output.txt")
    t.add_argument("--out", default="features.npz")
    t.add_argument("--image-quality-threshold", type=float, default=None)
    t.add_argument("--image-quality-method", default="nima")
    t.add_argument("--nima-weights-path", default=None, help="NIMA .pth (or $FFVC_NIMA_WEIGHTS)")
    t.add_argument("--merge", action="store_true")
    t.set_defaults(fn=_cmd_encode_wds)

    t = sub.add_parser(
        "merge-features", aliases=["merge_features"],
        help="concatenate per-process feature shards into one file (main.py:372-390)",
    )
    t.add_argument("inputs", nargs="+", help="shard paths or one glob pattern")
    t.add_argument("--out", required=True)
    t.set_defaults(fn=_cmd_merge_features)

    t = sub.add_parser("evaluate", help="CLIP score / FID over prompts (main.py:1063)")
    t.add_argument("model_path")
    t.add_argument("data_path")
    t.add_argument("--batch-size", type=int, default=None)
    t.add_argument("--out-folder", default=None)
    t.add_argument("--clip-threshold", type=float, default=25)
    t.add_argument("--nb-test", type=int, default=None)
    t.add_argument("--save-images", action="store_true")
    t.add_argument("--img-folder", default=None)
    t.add_argument("--images-per-row", type=int, default=8)
    t.add_argument("--seed", type=int, default=42)
    t.add_argument("--clip-model", default="ViT-B/32")
    t.add_argument("--clip-model-path", default=None, help="weights for the eval perceptor")
    t.add_argument("--compute-fid", action="store_true")
    t.add_argument("--inception-features-real-path", default=None)
    t.add_argument("--inception-weights-path", default=None)
    t.add_argument("--prior-path", default=None)
    t.set_defaults(fn=_cmd_evaluate)

    t = sub.add_parser("train-prior", aliases=["train_prior"], help="train the flow prior (main.py:1335)")
    t.add_argument("config_file")
    t.set_defaults(fn=_cmd_train_prior)

    t = sub.add_parser("download-weights", help="fetch the released model zoo")
    t.set_defaults(fn=_cmd_download_weights)

    t = sub.add_parser(
        "verify-weights", aliases=["verify_weights"],
        help="convert released checkpoints, probe deterministically, diff vs goldens",
    )
    t.add_argument("--weights-dir", default=None, help="default $FFVC_WEIGHTS_DIR or ./weights")
    t.add_argument("--goldens-dir", default="goldens")
    t.add_argument("--models", nargs="*", help="zoo names or paths (default: all mappers)")
    t.add_argument("--download", action="store_true", help="fetch missing zoo files first")
    t.add_argument("--update-goldens", action="store_true")
    t.add_argument("--atol", type=float, default=2e-2)
    t.add_argument("--out", default="verify_weights_report.json")
    t.set_defaults(fn=_cmd_verify_weights)

    t = sub.add_parser("bench", help="run the benchmark harness")
    t.set_defaults(fn=_cmd_bench)

    t = sub.add_parser("serve", help="gradio web app over local checkpoints (app.py:118-124)")
    t.add_argument("model_paths", nargs="*", help="mapper checkpoints (default: auto-discover)")
    t.set_defaults(fn=_cmd_serve)
    return p


def _cmd_serve(args):
    from feed_forward_vqgan_clip_tpu.serve.app import build_app

    build_app(args.model_paths or None).launch()


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="%(levelname)s %(name)s: %(message)s")
    from feed_forward_vqgan_clip_tpu.utils import (
        enable_compilation_cache,
        maybe_initialize_distributed,
    )

    # multi-host rendezvous must precede any other JAX use (hvd.init parity,
    # main.py:528-531); no-op single-process
    maybe_initialize_distributed()
    enable_compilation_cache()
    args = build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()

"""Gradio web app over the Predictor.

Parity with /root/reference/app.py:43-124: text prompt, model dropdown, prior
checkbox, grid-size dropdown, seed slider -> image. gradio is an optional
dependency (not baked into this image); the module degrades to a clear error.
"""

import logging
from glob import glob
from typing import Optional, Sequence

from feed_forward_vqgan_clip_tpu.serve.predictor import Predictor

log = logging.getLogger(__name__)


def build_fn(model_paths: Optional[Sequence[str]] = None, out_path: str = "gradio_out.png"):
    """The app's callback, gradio-free: (prompt, model, prior, grid_size, seed)
    -> PNG path. Split out of build_app so the serving contract is testable in
    environments without gradio (tests/test_serving.py::TestGradioApp drives
    every input combination directly — the reference's app.py fn, app.py:43-116,
    was only ever exercised through a live browser)."""
    if not model_paths:
        model_paths = sorted(glob("*.th")) + sorted(glob("results/*/checkpoint"))
    predictor = Predictor(model_paths)
    predictor.setup()
    names = list(predictor.models)

    def fn(prompt, model, prior, grid_size, seed):
        path = predictor.predict(
            prompt, model=model or None, prior=bool(prior),
            grid_size=grid_size, seed=int(seed), out_path=out_path,
        )
        return path

    return fn, names


def build_app(model_paths: Optional[Sequence[str]] = None):
    try:
        import gradio as gr
    except ImportError as e:  # pragma: no cover - optional dep
        raise ImportError(
            "gradio is not installed; `pip install gradio` to serve the web app"
        ) from e

    fn, names = build_fn(model_paths)

    return gr.Interface(
        fn=fn,
        inputs=[
            gr.Textbox(label="Prompt"),
            gr.Dropdown(names, label="Model", value=names[0] if names else None),
            gr.Checkbox(label="Use prior"),
            gr.Dropdown(["1x1", "2x2", "3x3", "4x4"], value="1x1", label="Grid"),
            gr.Slider(0, 2**31 - 1, step=1, value=0, label="Seed"),
        ],
        outputs=gr.Image(type="filepath"),
        title="feed_forward_vqgan_clip_tpu",
    )


def main():  # pragma: no cover - manual entry point
    build_app().launch()


if __name__ == "__main__":
    main()

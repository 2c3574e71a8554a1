"""Report-figure generator driven by REAL Monte-Carlo data.

Capability parity with the reference's ``generate_images.py`` (re-runs
simulations for all 9 decoders and renders FER/BER/iteration/parameter/
weight-pattern figures, ``:79-415``). The reference repo's *committed* PNGs
actually come from its synthetic generators (``simple_image_generator.py``,
``quick_image_generator.py`` — closed-form exp curves, SURVEY §8.6); this
framework has no synthetic path at all: every curve below is measured.

    python generate_images.py [--out images] [--frames 4096]
"""

from __future__ import annotations

import argparse
import os


def generate_all_images(out_dir: str = "images", max_frames: int = 4096,
                        verbose: bool = True):
    from ldpc_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import ldpc_tpu
    from ldpc_tpu.report import (
        analyze_weight_patterns,
        parameter_reduction_report,
        plot_ber_curves,
        plot_comparison_grid,
        plot_fer_curves,
        plot_iteration_curves,
        plot_weight_patterns,
    )
    from ldpc_tpu.sim import LDPCSimulator, SimulationConfig, create_test_decoders

    os.makedirs(out_dir, exist_ok=True)
    code = ldpc_tpu.create_peg_code(n=128, m=64, dv=3, seed=0,
                                    max_iterations=12)
    zoo = create_test_decoders(code, max_iterations=12)
    cfg = SimulationConfig(snr_range=(0.0, 5.0), snr_step=1.0,
                           max_frames=max_frames, max_errors=max(200, max_frames // 8),
                           min_frames=min(1024, max_frames), wave_size=1024,
                           results_dir=out_dir)
    sim = LDPCSimulator(cfg)
    results = sim.simulate_multiple_decoders(zoo, verbose=verbose)
    sim.save_results(filename="mc_results.json")

    paths = [
        plot_fer_curves(results, os.path.join(out_dir, "fer_comparison.png")),
        plot_ber_curves(results, os.path.join(out_dir, "ber_comparison.png")),
        plot_iteration_curves(results,
                              os.path.join(out_dir, "iteration_comparison.png")),
        plot_comparison_grid(results, os.path.join(out_dir, "comparison.png")),
    ]

    # parameter-comparison bar chart (reference parameter_comparison.png)
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rep = parameter_reduction_report(zoo, baseline="N-NMS")
    names = list(rep["decoders"])
    counts = [rep["decoders"][n]["params"] for n in names]
    fig, ax = plt.subplots(figsize=(9, 4.5))
    ax.bar(names, counts)
    ax.set_ylabel("trainable parameters")
    ax.set_title(f"Parameter counts ({code.n},{code.k}) @ 12 iterations")
    plt.setp(ax.get_xticklabels(), rotation=30, ha="right", fontsize=8)
    fig.tight_layout()
    p = os.path.join(out_dir, "parameter_comparison.png")
    fig.savefig(p, dpi=130)
    plt.close(fig)
    paths.append(p)

    # weight-pattern figure (reference weight_pattern_analysis.png)
    paths.append(plot_weight_patterns(
        analyze_weight_patterns(zoo["N-NMS"]),
        os.path.join(out_dir, "weight_pattern_analysis.png")))
    return paths


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="images")
    ap.add_argument("--frames", type=int, default=4096)
    args = ap.parse_args()
    for p in generate_all_images(args.out, args.frames):
        print(p)


def generate_deep_fer_figure(out_dir: str = "images",
                             verbose: bool = True) -> str:
    """Render the round-2 deep-FER campaign (measured curves down to FER
    ~2e-8; experiments/deep_fer_results.json + deep_fer_trained_l6) —
    the paper's §VII-B no-error-floor evidence regime."""
    import json

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    curves = {}
    with open("experiments/deep_fer_results.json") as f:
        for name, c in json.load(f)["curves"].items():
            curves[name] = c
    try:
        with open("experiments/deep_fer_trained_l6_results.json") as f:
            curves["W-OMS-RCQ-bc3-trained-L6"] = json.load(f)["curve"]
    except FileNotFoundError:
        pass

    style = {
        "float-MS-L6": ("float min-sum, layered T=6", "k", "o"),
        "RCQ-bc3-L6": ("RCQ bc=3/bv=8, layered T=6", "C0", "s"),
        "RCQ-bc4-L6": ("RCQ bc=4/bv=8, layered T=6", "C1", "^"),
        "W-OMS-RCQ-bc3-trained": ("trained W-OMS-RCQ bc=3, flooding T=10",
                                  "C2", "v"),
        "W-OMS-RCQ-bc3-trained-L6": ("trained W-OMS-RCQ bc=3, layered T=6",
                                     "C3", "D"),
    }
    fig, ax = plt.subplots(figsize=(7.2, 5.2))
    for name, c in curves.items():
        label, color, marker = style.get(name, (name, None, "o"))
        snr = c["snr_values"][: len(c["frame_error_rates"])]
        fer = c["frame_error_rates"]
        pts = [(s, f) for s, f in zip(snr, fer) if f > 0]
        if not pts:
            continue
        ax.semilogy(*zip(*pts), marker=marker, color=color, label=label)
    ax.set_xlabel("SNR (dB)")
    ax.set_ylabel("FER")
    ax.set_title("Deep-FER, (9472, 8192) QC code — 50M frames/point,\n"
                 "fused layered kernel + two-checkpoint compaction (1 chip)")
    ax.grid(True, which="both", alpha=0.3)
    ax.legend(fontsize=8)
    path = os.path.join(out_dir, "deep_fer.png")
    fig.tight_layout()
    fig.savefig(path, dpi=130)
    plt.close(fig)
    if verbose:
        print(f"wrote {path}")
    return path

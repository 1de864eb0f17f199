"""CLI entry point: ``python -m covid19uk_tpu.inference.inference``.

Mirrors the reference CLI (``/root/reference/covid19uk/inference/
inference.py:611-629``): ``-c config.yaml -o posterior.hd5 data.h5``.
"""

from covid19uk_tpu.inference.driver import mcmc, run_mcmc  # noqa: F401

if __name__ == "__main__":
    from argparse import ArgumentParser

    import yaml

    parser = ArgumentParser(description="Run MCMC inference algorithm")
    parser.add_argument(
        "-c", "--config", type=str, help="Config file", required=True
    )
    parser.add_argument(
        "-o", "--output", type=str, help="Output file", required=True
    )
    parser.add_argument("data_file", type=str, help="Data HDF5 file")
    args = parser.parse_args()

    with open(args.config, "r") as f:
        config = yaml.safe_load(f)

    mcmc(args.data_file, args.output, config["Mcmc"])

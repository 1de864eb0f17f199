"""Thin posterior HDF5 -> pickle.

Replaces ``/root/reference/covid19uk/posterior/thin.py`` (same contract:
slice every ``samples/*`` dataset by start:end:by, carry ``initial_state``,
pickle the dict).  Framework extension: when the posterior was sampled with
multiple chains, the chain axis is flattened into the iteration axis after
thinning, so downstream consumers stay chain-agnostic.
"""

import pickle as pkl

import h5py


def thin_posterior(input_file, output_file, config):
    """Slices ``samples/*`` by ``start:end:by`` and pickles the dict
    (reference thin.py:7-21)."""
    idx = slice(config["start"], config["end"], config["by"])

    with h5py.File(input_file, "r") as f:
        output_dict = {k: v[idx] for k, v in f["samples"].items()}
        initial_state = f["initial_state"][:]

    # Multi-chain runs store [draw, chain, ...]: fold chains into draws.
    if output_dict["seir"].ndim == 5:  # [draw, chain, M, T, X]
        output_dict = {
            k: v.reshape((-1,) + v.shape[2:]) for k, v in output_dict.items()
        }
    output_dict["initial_state"] = initial_state

    with open(output_file, "wb") as fo:
        pkl.dump(output_dict, fo)

    return output_dict


def main(argv=None):
    import argparse

    import yaml

    parser = argparse.ArgumentParser(
        description="Thin a posterior HDF5 file into a samples pickle"
    )
    parser.add_argument("samples", help="posterior HDF5 file")
    parser.add_argument("-c", "--config", required=True, help="YAML config")
    parser.add_argument("-o", "--output", required=True, help="output .pkl")
    args = parser.parse_args(argv)

    with open(args.config) as f:
        section = yaml.safe_load(f)["ThinPosterior"]
    thin_posterior(args.samples, args.output, section)


if __name__ == "__main__":
    main()

"""Thin posterior HDF5 -> pickle.

Replaces ``/root/reference/covid19uk/posterior/thin.py``.  When the posterior
was sampled with multiple chains, the chain axis is flattened into the
iteration axis after thinning, so downstream consumers are chain-agnostic.
"""

import pickle as pkl

import h5py


def thin_posterior(input_file, output_file, config):
    """Slices ``samples/*`` by ``start:end:by`` and pickles the dict
    (reference thin.py:7-21)."""
    idx = slice(config["start"], config["end"], config["by"])

    f = h5py.File(input_file, "r", rdcc_nbytes=1024**3, rdcc_nslots=1e6)
    output_dict = {k: v[idx] for k, v in f["samples"].items()}
    initial_state = f["initial_state"][:]
    f.close()

    # Multi-chain runs store [draw, chain, ...]: fold chains into draws.
    seir_ndim = output_dict["seir"].ndim
    if seir_ndim == 5:  # [draw, chain, M, T, X]
        output_dict = {
            k: v.reshape((-1,) + v.shape[2:]) for k, v in output_dict.items()
        }
    output_dict["initial_state"] = initial_state

    with open(output_file, "wb") as fo:
        pkl.dump(output_dict, fo)

    return output_dict


if __name__ == "__main__":
    import argparse

    import yaml

    parser = argparse.ArgumentParser()
    parser.add_argument(
        "-c", "--config", type=str, help="Configuration file", required=True
    )
    parser.add_argument(
        "-o", "--output", type=str, help="Output pkl file", required=True
    )
    parser.add_argument("samples", type=str, help="Posterior HDF5 file")
    args = parser.parse_args()

    with open(args.config, "r") as f:
        config = yaml.safe_load(f)

    print("Config: ", config["ThinPosterior"])
    thin_posterior(args.samples, args.output, config["ThinPosterior"])

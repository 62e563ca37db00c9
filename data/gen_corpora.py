"""Regenerate the MIT-states template caption corpora.

Produces the same train/test splits as the reference's generator scripts
(/root/reference/data/gen_MIT_states.py:1-23, gen_MIT_objects.py:1-24): adjective/
object vocabularies from MIT_states_raw.txt, two caption templates, seed-42
shuffle, 90/10 split. Run from this directory: `python gen_corpora.py`.
"""

import random
from itertools import product


def load_vocab():
    with open("MIT_states_raw.txt") as fd:
        pairs = [line.split(" ") for line in fd.readlines()]
    pairs = [p for p in pairs if len(p) == 2]
    adjs = sorted({p[0].strip() for p in pairs})
    objs = sorted({p[1].strip() for p in pairs})
    return adjs, objs


def write_split(texts, name):
    random.seed(42)
    random.shuffle(texts)
    nb_train = int(len(texts) * 0.9)
    with open(f"{name}_train.txt", "w") as fd:
        fd.write("\n".join(texts[:nb_train]))
    with open(f"{name}_test.txt", "w") as fd:
        fd.write("\n".join(texts[nb_train:]))
    print(f"{name}: {nb_train} train / {len(texts) - nb_train} test")


def gen_grid(n=9, out="test.txt", seed=None):
    """The reference's data/MIT_objects_gen_grid.py: sample n objects at random
    and write the full n*n 'made of' grid (object x material product) to `out`.
    The reference shuffles unseeded; pass --seed for a reproducible grid."""
    _, objs = load_vocab()
    objs = list(objs)
    random.Random(seed).shuffle(objs)
    objs = objs[:n]
    texts = [
        f"The {obj} in this picture is made of {adj}."
        for adj, obj in product(objs, objs)
    ]
    with open(out, "w") as fd:
        fd.write("\n".join(texts))
    print(f"grid: {len(texts)} captions ({n}x{n}) -> {out}")


def main():
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--grid", type=int, default=None, metavar="N",
                    help="instead of the splits, write an NxN object grid (MIT_objects_gen_grid.py)")
    ap.add_argument("--out", default="test.txt")
    ap.add_argument("--seed", type=int, default=None)
    args = ap.parse_args()
    if args.grid:
        gen_grid(args.grid, args.out, args.seed)
        return

    adjs, objs = load_vocab()

    states = [
        f"The {obj} in this picture is {adj}. {obj.capitalize()} is {adj}."
        for adj, obj in product(adjs, objs)
    ]
    write_split(states, "MIT_states")

    objects = [
        f"The {obj} in this picture is made of {adj}."
        for adj, obj in product(objs, objs)
        if adj != obj
    ]
    write_split(objects, "MIT_objects")


if __name__ == "__main__":
    main()

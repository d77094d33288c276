"""Synthetic dataset generator matching the hackathon CSV schema.

The reference's private dataset (``data/hackathon_augmented_data.csv`` +
``data/friendships.csv``) is not shipped. This generator produces data with
the same column contract (schema.py) and a learnable booking signal — a
low-rank latent user×item affinity plus price/quality effects — so that the
full train→serve pipeline is testable end-to-end and a trained DCN-R reaches
AUC well above chance. A clustered friendship graph (homophily over latent
user clusters) exercises the friend-based candidate generation path.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from hhrs_tpu.data import schema

CITIES = [
    "Sochi", "Moscow", "Kazan", "SPB", "Kaliningrad",
    "Ekaterinburg", "Novosibirsk", "Vladivostok",
]
HOTEL_TYPES = ["hotel", "hostel", "apartment", "resort", "guesthouse"]


@dataclass
class SyntheticDataset:
    reviews: pd.DataFrame
    friendships: pd.DataFrame


def generate_synthetic_dataset(
    n_users: int = 2000,
    n_items: int = 600,
    n_reviews: int = 40000,
    n_friendships: int = 6000,
    n_cities: int = 6,
    latent_dim: int = 8,
    seed: int = 0,
) -> SyntheticDataset:
    rng = np.random.default_rng(seed)
    n_cities = min(n_cities, len(CITIES))

    # Latent structure: users belong to taste clusters; items have latent
    # vectors correlated with their city and type.
    n_clusters = 8
    user_cluster = rng.integers(0, n_clusters, size=n_users)
    cluster_centers = rng.normal(0, 1.0, size=(n_clusters, latent_dim))
    user_vecs = cluster_centers[user_cluster] + 0.4 * rng.normal(size=(n_users, latent_dim))

    item_city = rng.integers(0, n_cities, size=n_items)
    item_type = rng.integers(0, len(HOTEL_TYPES), size=n_items)
    item_vecs = rng.normal(0, 1.0, size=(n_items, latent_dim))
    item_stars = rng.integers(1, 6, size=n_items).astype(np.float64)
    # price correlates with stars
    item_price = np.round(
        np.exp(rng.normal(7.5 + 0.35 * item_stars, 0.4)), 0
    )
    item_quality = 0.5 * (item_stars - 3) + rng.normal(0, 0.7, size=n_items)
    item_reviews_count = rng.integers(1, 2000, size=n_items).astype(np.float64)

    # Reviews: each row is one user×item interaction in the item's city.
    u = rng.integers(0, n_users, size=n_reviews)
    it = rng.integers(0, n_items, size=n_reviews)
    affinity = np.einsum("ij,ij->i", user_vecs[u], item_vecs[it]) / np.sqrt(latent_dim)
    base = affinity + item_quality[it]

    # rating_overall on a 1..10 scale, bimodal so the noise filter keeps most rows.
    rating_overall = np.clip(np.round(5.5 + 2.5 * np.tanh(base) + rng.normal(0, 1.2, n_reviews)), 1, 10)
    sub = lambda: np.clip(np.round(rating_overall + rng.normal(0, 1.0, n_reviews)), 1, 10)
    rating_location = sub()
    rating_cleanliness = sub()
    rating_food = sub()
    rating_service = sub()

    # Booking probability: driven by affinity + quality − price sensitivity.
    logit = 1.4 * base - 0.3 * (np.log(item_price[it]) - 8.0) + rng.normal(0, 0.5, n_reviews)
    was_booked = (rng.uniform(size=n_reviews) < 1.0 / (1.0 + np.exp(-logit))).astype(np.int64)

    reviews = pd.DataFrame(
        {
            schema.RAW_USER_COL: u + 1,  # external ids are 1-based, non-contiguous ok
            schema.RAW_ITEM_COL: it + 101,
            "city": np.array(CITIES)[item_city[it]],
            "hotel_type": np.array(HOTEL_TYPES)[item_type[it]],
            "price_rub": item_price[it],
            "stars": item_stars[it],
            "user_reviews_count": item_reviews_count[it],
            "rating_overall": rating_overall,
            "rating_location": rating_location,
            "rating_cleanliness": rating_cleanliness,
            "rating_food": rating_food,
            "rating_service": rating_service,
            schema.TARGET_COL: was_booked,
        }
    )

    # Friendships: prefer same-cluster pairs (homophily), undirected, deduped.
    f1 = rng.integers(0, n_users, size=n_friendships * 2)
    same = rng.uniform(size=n_friendships * 2) < 0.7
    # same-cluster partner: random position inside f1's cluster block of the
    # cluster-sorted user ordering
    order = np.argsort(user_cluster, kind="stable")
    cluster_sorted = user_cluster[order]
    starts = np.searchsorted(cluster_sorted, user_cluster[f1], side="left")
    ends = np.searchsorted(cluster_sorted, user_cluster[f1], side="right")
    within = starts + rng.integers(0, np.maximum(ends - starts, 1))
    f2 = np.where(
        same,
        order[np.clip(within, 0, n_users - 1)],
        rng.integers(0, n_users, size=n_friendships * 2),
    )
    mask = f1 != f2
    a = np.minimum(f1[mask], f2[mask]) + 1
    b = np.maximum(f1[mask], f2[mask]) + 1
    pairs = pd.DataFrame({"user_id_1": a, "user_id_2": b}).drop_duplicates().head(n_friendships)

    return SyntheticDataset(reviews=reviews, friendships=pairs.reset_index(drop=True))


def write_synthetic_dataset(data_dir: str, **kwargs) -> SyntheticDataset:
    import os

    os.makedirs(data_dir, exist_ok=True)
    ds = generate_synthetic_dataset(**kwargs)
    ds.reviews.to_csv(os.path.join(data_dir, "hackathon_augmented_data.csv"), index=False)
    ds.friendships.to_csv(os.path.join(data_dir, "friendships.csv"), index=False)
    return ds


def append_reviews(data_dir: str, user_id: int, n: int = 1,
                   rating: int | None = None) -> None:
    """Append ``n`` copies of the CSV's last review row under a NEW
    external ``user_id``, so the file's size changes and the serve-side
    stat fingerprint (serve/reload.py) registers the drop.

    The standard way tests and benchmarks simulate a refreshed data drop
    for the hot-reload/continuous-training surfaces; ``rating`` overrides
    ``rating_overall`` (e.g. 9 to make the rows retrieval positives).
    Scope: this repo's SYNTHETIC CSVs (write_synthetic_dataset) — the row
    is split naively on commas, so a last row containing quoted embedded
    commas would misalign (synthetic data never quotes); a header-only
    file is a ValueError."""
    import os

    path = os.path.join(data_dir, "hackathon_augmented_data.csv")
    with open(path) as f:
        header = f.readline().strip().split(",")
        rows = f.readlines()
    if not rows:
        raise ValueError(f"{path} has no data rows to clone")
    last = rows[-1].strip().split(",")
    if len(last) != len(header) or any('"' in cell for cell in last):
        raise ValueError(
            f"{path}'s last row is not naive-splittable (quoted/misaligned "
            "fields) — append_reviews only supports the synthetic CSV shape")
    last[header.index("guest_id")] = str(user_id)
    if rating is not None:
        last[header.index("rating_overall")] = str(rating)
    # A hand-edited CSV may lack a trailing newline; appending would then
    # concatenate the first cloned row onto the last existing line,
    # corrupting both (ADVICE r4).
    needs_nl = not rows[-1].endswith("\n")
    with open(path, "a") as f:
        if needs_nl:
            f.write("\n")
        f.write("\n".join(",".join(last) for _ in range(n)) + "\n")

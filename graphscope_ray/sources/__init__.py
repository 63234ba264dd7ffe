from graphscope_ray.sources.repos import generate_repos, write_repos_parquet

__all__ = ["generate_repos", "write_repos_parquet"]

from logai_spark.parse.drain import DrainConfig, DrainTree
from logai_spark.parse.distributed import mine_templates, match_templates, parse_df

__all__ = ["DrainConfig", "DrainTree", "mine_templates", "match_templates", "parse_df"]

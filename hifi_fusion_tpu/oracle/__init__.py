from .oracle import OracleGrid, OracleVoxel

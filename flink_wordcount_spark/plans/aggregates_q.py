"""(placeholder — filled in as the operator surface lands)"""

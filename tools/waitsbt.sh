#!/bin/bash
# Poll the sbt tmux pane until the prompt returns; print result lines.
while true; do
  last=$(tmux capture-pane -t sbt -p | grep -v '^$' | tail -1)
  if echo "$last" | grep -q 'sbt:heavydbspark'; then break; fi
  sleep 10
done
tmux capture-pane -t sbt -p | grep -aE "\[verify\]|Tests:|All tests passed|\*\*\* [0-9]+ TEST|Total time" | tail -8

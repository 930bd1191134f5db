DELETE FROM integers WHERE i%2=0;
